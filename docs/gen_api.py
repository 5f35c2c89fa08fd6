"""Generate per-module API reference pages (docs/api/<module>.md) from
docstrings — a sphinx-apidoc-lite for environments without sphinx.

Run: python docs/gen_api.py
"""
import importlib
import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODULES = [
    'neurodiffeq_tpu.fields',
    'neurodiffeq_tpu.operators',
    'neurodiffeq_tpu.networks',
    'neurodiffeq_tpu.function_basis',
    'neurodiffeq_tpu.generators',
    'neurodiffeq_tpu.conditions',
    'neurodiffeq_tpu.losses',
    'neurodiffeq_tpu.solvers',
    'neurodiffeq_tpu.solvers_utils',
    'neurodiffeq_tpu.monitors',
    'neurodiffeq_tpu.callbacks',
    'neurodiffeq_tpu.ode',
    'neurodiffeq_tpu.pde',
    'neurodiffeq_tpu.pde_spherical',
    'neurodiffeq_tpu.temporal',
    'neurodiffeq_tpu.hypersolver',
    'neurodiffeq_tpu.parallel',
    'neurodiffeq_tpu.ops',
    'neurodiffeq_tpu.utils',
    'neurodiffeq_tpu._version_utils',
]

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'api')


def _sig(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return '(...)'


def _doc(obj, indent=''):
    doc = inspect.getdoc(obj)
    if not doc:
        return ''
    return '\n'.join(indent + line for line in doc.split('\n'))


def _is_public(name, obj, module):
    if name.startswith('_') and name not in ('_losses',):
        return False
    mod = getattr(obj, '__module__', None)
    return mod is None or mod.startswith(module.__name__.rsplit('.', 1)[0])


def render_module(modname):
    module = importlib.import_module(modname)
    short = modname.split('.')[-1]
    lines = [f'# `{modname}`', '']
    top = inspect.getdoc(module)
    if top:
        lines += [top, '']

    members = vars(module)
    public = getattr(module, '__all__', None)
    names = public if public else [n for n in members if not n.startswith('_')]

    classes = [(n, members[n]) for n in names
               if n in members and inspect.isclass(members[n]) and _is_public(n, members[n], module)]
    functions = [(n, members[n]) for n in names
                 if n in members and inspect.isfunction(members[n]) and _is_public(n, members[n], module)]

    if classes:
        lines += ['## Classes', '']
        for name, cls in classes:
            lines += [f'### `{name}{_sig(cls.__init__) if "__init__" in vars(cls) else "()"}`', '']
            d = _doc(cls)
            if d:
                lines += [d, '']
            methods = [(mn, mv) for mn, mv in vars(cls).items()
                       if inspect.isfunction(mv) and not mn.startswith('_') and inspect.getdoc(mv)]
            for mn, mv in methods:
                lines += [f'#### `{name}.{mn}{_sig(mv)}`', '']
                lines += [_doc(mv), '']

    if functions:
        lines += ['## Functions', '']
        for name, fn in functions:
            lines += [f'### `{name}{_sig(fn)}`', '']
            d = _doc(fn)
            if d:
                lines += [d, '']

    return short, '\n'.join(lines).rstrip() + '\n'


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    index = ['# API reference', '',
             'Generated from docstrings by `docs/gen_api.py`.', '']
    for modname in MODULES:
        short, text = render_module(modname)
        path = os.path.join(OUT_DIR, f'{short}.md')
        with open(path, 'w') as f:
            f.write(text)
        n_entries = text.count('\n### ')
        index.append(f'- [`{modname}`]({short}.md) — {n_entries} documented entries')
        print(f'wrote {path} ({n_entries} entries)')
    with open(os.path.join(OUT_DIR, 'README.md'), 'w') as f:
        f.write('\n'.join(index) + '\n')


if __name__ == '__main__':
    main()
