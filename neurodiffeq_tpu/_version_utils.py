"""Deprecation helpers.

Provides the same capability surface as the reference's version helpers
(``neurodiffeq/_version_utils.py:5-48``): a class-alias factory that emits
``FutureWarning`` on instantiation and a kwargs-renaming decorator that emits
``DeprecationWarning`` when old keyword names are used.
"""
import functools
import warnings


def warn_deprecate_class(new_class):
    """Return a factory emitting a FutureWarning and constructing ``new_class``.

    :param new_class: The class to which the deprecated alias forwards.
    :type new_class: type
    :return: A callable that constructs ``new_class`` with a warning.
    :rtype: callable
    """

    @functools.wraps(new_class)
    def old_class_getter(*args, **kwargs):
        warnings.warn(
            f"This class name is deprecated, use {new_class} instead",
            FutureWarning,
        )
        return new_class(*args, **kwargs)

    return old_class_getter


def deprecated_alias(**aliases):
    """Decorator renaming deprecated kwargs to their new names with a warning.

    Usage: ``@deprecated_alias(x='u')`` makes ``f(x=...)`` forward to ``f(u=...)``.
    """

    def decorator(func):
        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            _rename_kwargs(func.__name__, kwargs, aliases)
            return func(*args, **kwargs)

        return wrapper

    return decorator


def _rename_kwargs(func_name, kwargs, aliases):
    for old, new in aliases.items():
        if old in kwargs:
            if new in kwargs:
                raise TypeError(f"{func_name} received both {old} (deprecated) and {new}")
            warnings.warn(f"`{old}` is deprecated; use `{new}` instead", DeprecationWarning)
            kwargs[new] = kwargs.pop(old)
