"""Deprecation helpers.

Provides the same capability surface as the reference's version helpers
(``neurodiffeq/_version_utils.py:5-48``): a class-alias factory that emits
``FutureWarning`` on instantiation and a kwargs-renaming decorator that emits
``FutureWarning`` when old keyword names are used (and raises ``KeyError``
when both the old and new names are passed — reference
``_version_utils.py:42-48``).
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
                raise KeyError(f"{func_name} received both `{old}` (deprecated) and `{new}` (recommended)")
            warnings.warn(f"The argument `{old}` is deprecated for {func_name}; use `{new}` instead.", FutureWarning)
            kwargs[new] = kwargs.pop(old)
