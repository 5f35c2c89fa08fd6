"""Build the documentation site as static HTML — no third-party deps.

The reference ships a sphinx build (``/root/reference/docs/conf.py``,
``index.rst``); this environment has no sphinx, so the site is built with a
small purpose-sized markdown renderer over the files that already exist:

- ``docs/*.md``                 — guides (getting started, advanced, ...)
- ``docs/api/*.md``             — generated API reference (``docs/gen_api.py``)
- ``docs/tutorials/*.py``       — executable percent-format tutorials,
                                  rendered cell-by-cell
- ``README.md``                 — becomes the landing page
- ``ARCHITECTURE.md``, ``benchmarks/RESULTS.md`` — design & perf pages

Usage::

    python docs/build_site.py [--out docs/_site]

The build fails (exit 1) on dangling internal links, so the smoke test in
``tests/test_docs_site.py`` doubles as a site-wide link checker.
"""
import argparse
import html
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# ---------------------------------------------------------------------------
# inline markdown
# ---------------------------------------------------------------------------

_ROLE_RE = re.compile(r':(?:class|mod|func|meth|attr|data|obj|exc):`~?([^`]+)`')
_CODE2_RE = re.compile(r'``([^`]+)``')
_CODE1_RE = re.compile(r'`([^`]+)`')
_IMG_RE = re.compile(r'!\[([^\]]*)\]\(([^)\s]+)\)')
_LINK_RE = re.compile(r'\[([^\]]+)\]\(([^)\s]+)\)')
_BOLD_RE = re.compile(r'\*\*([^*]+)\*\*')
_ITAL_RE = re.compile(r'(?<![\w*])\*([^*\s][^*]*?)\*(?![\w*])')
_AUTOLINK_RE = re.compile(r'(?<![">])(https?://[^\s<)]+)')


def _md_link_to_html(target):
    """Internal links keep their source-relative form here; `build_site`
    rewrites them to output pages in a post-pass with page context."""
    return target


def render_inline(text, links_out=None):
    """Render inline markdown in `text` (already a single line/paragraph)."""
    parts = []  # protected segments (code spans) swapped out before escaping

    def protect(m, cls='code'):
        parts.append('<code>%s</code>' % html.escape(m.group(1)))
        return '\x00%d\x00' % (len(parts) - 1)

    text = _ROLE_RE.sub(lambda m: protect(m), text)
    text = _CODE2_RE.sub(lambda m: protect(m), text)
    text = _CODE1_RE.sub(lambda m: protect(m), text)
    text = html.escape(text, quote=False)

    def img(m):
        alt, src = m.group(1), m.group(2)
        if links_out is not None:
            links_out.append(src)
        return '<img src="%s" alt="%s">' % (src, alt)

    def link(m):
        label, target = m.group(1), m.group(2)
        href = _md_link_to_html(target)
        if links_out is not None:
            links_out.append(href)
        return '<a href="%s">%s</a>' % (href, label)

    text = _IMG_RE.sub(img, text)
    text = _LINK_RE.sub(link, text)
    text = _BOLD_RE.sub(r'<strong>\1</strong>', text)
    text = _ITAL_RE.sub(r'<em>\1</em>', text)
    text = _AUTOLINK_RE.sub(r'<a href="\1">\1</a>', text)
    for i, chunk in enumerate(parts):
        text = text.replace('\x00%d\x00' % i, chunk)
    return text


# ---------------------------------------------------------------------------
# python syntax highlighting (for fenced ```python blocks and tutorial cells)
# ---------------------------------------------------------------------------

_PY_KEYWORDS = (
    'False None True and as assert async await break class continue def del '
    'elif else except finally for from global if import in is lambda nonlocal '
    'not or pass raise return try while with yield'
).split()

_PY_TOKEN_RE = re.compile(
    r'(?P<comment>#[^\n]*)'
    r'|(?P<string>[rbfu]{0,2}(?:"""(?:\\.|[^\\])*?"""|\'\'\'(?:\\.|[^\\])*?\'\'\'|"(?:\\.|[^"\\\n])*"|\'(?:\\.|[^\'\\\n])*\'))'
    r'|(?P<number>\b\d[\d_]*(?:\.\d+)?(?:e[+-]?\d+)?\b)'
    r'|(?P<word>\b[A-Za-z_]\w*\b)',
    re.IGNORECASE,
)


def highlight_python(code):
    out = []
    pos = 0
    for m in _PY_TOKEN_RE.finditer(code):
        out.append(html.escape(code[pos:m.start()]))
        tok = m.group(0)
        esc = html.escape(tok)
        if m.lastgroup == 'comment':
            out.append('<span class="c">%s</span>' % esc)
        elif m.lastgroup == 'string':
            out.append('<span class="s">%s</span>' % esc)
        elif m.lastgroup == 'number':
            out.append('<span class="n">%s</span>' % esc)
        elif m.lastgroup == 'word' and tok in _PY_KEYWORDS:
            out.append('<span class="k">%s</span>' % esc)
        else:
            out.append(esc)
        pos = m.end()
    out.append(html.escape(code[pos:]))
    return ''.join(out)


def render_code_block(code, lang):
    if lang in ('python', 'py', ''):
        body = highlight_python(code)
    else:
        body = html.escape(code)
    cls = (' class="lang-%s"' % lang) if lang else ''
    return '<pre%s><code>%s</code></pre>' % (cls, body)


# ---------------------------------------------------------------------------
# block-level markdown
# ---------------------------------------------------------------------------

_SLUG_RE = re.compile(r'[^\w\- ]')


def slugify(text):
    text = _CODE2_RE.sub(r'\1', text)
    text = _CODE1_RE.sub(r'\1', text)
    return _SLUG_RE.sub('', text).strip().lower().replace(' ', '-')


def render_markdown(md, links_out=None, headings_out=None):
    """Render a markdown document body to HTML."""
    lines = md.split('\n')
    out = []
    i = 0
    n = len(lines)
    para = []

    def flush_para():
        if para:
            out.append('<p>%s</p>' % render_inline(' '.join(para), links_out))
            para.clear()

    while i < n:
        line = lines[i]
        stripped = line.strip()

        if stripped.startswith('```'):
            flush_para()
            lang = stripped[3:].strip()
            i += 1
            block = []
            while i < n and not lines[i].strip().startswith('```'):
                block.append(lines[i])
                i += 1
            out.append(render_code_block('\n'.join(block), lang))
            i += 1
            continue

        m = re.match(r'^(#{1,6})\s+(.*)$', line)
        if m:
            flush_para()
            level = len(m.group(1))
            text = m.group(2).strip()
            anchor = slugify(text)
            if headings_out is not None:
                headings_out.append((level, text, anchor))
            out.append('<h%d id="%s">%s</h%d>'
                       % (level, anchor, render_inline(text, links_out), level))
            i += 1
            continue

        if re.match(r'^(-{3,}|\*{3,}|_{3,})\s*$', stripped):
            flush_para()
            out.append('<hr>')
            i += 1
            continue

        # table: current line has |, next line is the |---| separator
        if ('|' in stripped and i + 1 < n
                and re.match(r'^\s*\|?[\s:|-]+\|[\s:|-]*$', lines[i + 1])
                and '-' in lines[i + 1]):
            flush_para()
            header = [c.strip() for c in stripped.strip('|').split('|')]
            i += 2
            rows = []
            while i < n and '|' in lines[i].strip() and lines[i].strip():
                rows.append([c.strip() for c in lines[i].strip().strip('|').split('|')])
                i += 1
            out.append('<table><thead><tr>%s</tr></thead><tbody>' % ''.join(
                '<th>%s</th>' % render_inline(c, links_out) for c in header))
            for row in rows:
                out.append('<tr>%s</tr>' % ''.join(
                    '<td>%s</td>' % render_inline(c, links_out) for c in row))
            out.append('</tbody></table>')
            continue

        if stripped.startswith('>'):
            flush_para()
            quote = []
            while i < n and lines[i].strip().startswith('>'):
                quote.append(lines[i].strip()[1:].strip())
                i += 1
            out.append('<blockquote>%s</blockquote>'
                       % render_markdown('\n'.join(quote), links_out))
            continue

        list_m = re.match(r'^(\s*)([-*+]|\d+[.)])\s+(.*)$', line)
        if list_m:
            flush_para()
            out.append(_render_list(lines, i, links_out))
            # skip the lines the list consumed
            i = _LIST_END[0]
            continue

        if not stripped:
            flush_para()
            i += 1
            continue

        para.append(stripped)
        i += 1

    flush_para()
    return '\n'.join(out)


_LIST_END = [0]  # out-param for _render_list


def _render_list(lines, start, links_out):
    """Render a (possibly nested, by 2+ space indentation) list."""
    items = []  # (indent, ordered, [content lines])
    i = start
    n = len(lines)
    while i < n:
        m = re.match(r'^(\s*)([-*+]|\d+[.)])\s+(.*)$', lines[i])
        if m:
            indent = len(m.group(1))
            ordered = m.group(2)[0].isdigit()
            items.append((indent, ordered, [m.group(3)]))
            i += 1
        elif lines[i].strip() and items and (len(lines[i]) - len(lines[i].lstrip())) > items[-1][0]:
            items[-1][2].append(lines[i].strip())  # continuation line
            i += 1
        elif not lines[i].strip() and i + 1 < n and re.match(r'^(\s*)([-*+]|\d+[.)])\s+', lines[i + 1]):
            i += 1  # blank line inside a loose list
        else:
            break
    _LIST_END[0] = i

    def build(idx, cur_indent):
        ordered = items[idx][1]
        tag = 'ol' if ordered else 'ul'
        parts = ['<%s>' % tag]
        while idx < len(items):
            indent, _, content = items[idx]
            if indent < cur_indent:
                break
            if indent > cur_indent:
                sub, idx = build(idx, indent)
                parts[-1] = parts[-1][:-len('</li>')] + sub + '</li>'
                continue
            parts.append('<li>%s</li>'
                         % render_inline(' '.join(content), links_out))
            idx += 1
        parts.append('</%s>' % tag)
        return ''.join(parts), idx

    html_list, _ = build(0, items[0][0])
    return html_list


# ---------------------------------------------------------------------------
# percent-format tutorials
# ---------------------------------------------------------------------------

def render_tutorial(py_source, links_out=None, headings_out=None):
    """Render a `# %%` percent-format python file: markdown cells as prose,
    code cells as highlighted blocks."""
    cells = re.split(r'(?m)^# %%.*$', py_source)
    markers = re.findall(r'(?m)^# %%(.*)$', py_source)
    out = []
    # cells[0] is anything before the first marker (usually empty)
    for marker, cell in zip(markers, cells[1:]):
        cell = cell.strip('\n')
        if not cell.strip():
            continue
        if '[markdown]' in marker:
            md = '\n'.join(
                re.sub(r'^#($| )', '', ln) for ln in cell.split('\n'))
            out.append(render_markdown(md, links_out, headings_out))
        else:
            out.append(render_code_block(cell, 'python'))
    return '\n'.join(out)


def percent_to_ipynb(py_source):
    """Convert a `# %%` percent-format tutorial to a Jupyter notebook dict
    (nbformat 4) — the literal notebook artifact class the reference ships
    (``/root/reference/docs/intro.ipynb`` etc.). Pure stdlib: the dict
    serializes with ``json.dumps``; no nbformat dependency."""
    cells_src = re.split(r'(?m)^# %%.*$', py_source)
    markers = re.findall(r'(?m)^# %%(.*)$', py_source)
    cells = []
    for marker, cell in zip(markers, cells_src[1:]):
        cell = cell.strip('\n')
        if not cell.strip():
            continue
        lines = cell.split('\n')
        if '[markdown]' in marker:
            md = [re.sub(r'^#($| )', '', ln) for ln in lines]
            cells.append({
                'cell_type': 'markdown', 'metadata': {},
                'source': [ln + '\n' for ln in md[:-1]] + md[-1:],
            })
        else:
            cells.append({
                'cell_type': 'code', 'metadata': {},
                'execution_count': None, 'outputs': [],
                'source': [ln + '\n' for ln in lines[:-1]] + lines[-1:],
            })
    return {
        'cells': cells,
        'metadata': {
            'kernelspec': {'display_name': 'Python 3', 'language': 'python',
                           'name': 'python3'},
            'language_info': {'name': 'python', 'version': '3'},
        },
        'nbformat': 4,
        'nbformat_minor': 5,
    }


# ---------------------------------------------------------------------------
# site assembly
# ---------------------------------------------------------------------------

CSS = """
:root { --bg:#ffffff; --fg:#1a1a1a; --dim:#6a6a6a; --line:#e2e2e2;
        --code-bg:#f6f6f4; --accent:#0a6e5c; --side-bg:#faf9f7; }
@media (prefers-color-scheme: dark) {
  :root { --bg:#15171a; --fg:#e4e2dd; --dim:#9a988f; --line:#2c2f33;
          --code-bg:#1e2126; --accent:#4fc0a8; --side-bg:#191c20; }
}
* { box-sizing: border-box; }
body { margin:0; background:var(--bg); color:var(--fg);
       font:16px/1.6 system-ui, -apple-system, "Segoe UI", sans-serif; }
a { color:var(--accent); text-decoration:none; }
a:hover { text-decoration:underline; }
.layout { display:flex; min-height:100vh; }
nav.side { width:250px; flex:none; background:var(--side-bg);
           border-right:1px solid var(--line); padding:20px 16px; }
nav.side h1 { font-size:17px; margin:0 0 14px; }
nav.side .group { margin:14px 0 4px; font-size:11px; letter-spacing:.08em;
                  text-transform:uppercase; color:var(--dim); }
nav.side a { display:block; padding:2px 6px; border-radius:5px;
             font-size:14px; color:var(--fg); }
nav.side a.current { background:var(--line); font-weight:600; }
main { flex:1; min-width:0; max-width:860px; padding:28px 40px 80px; }
h1,h2,h3,h4 { line-height:1.25; scroll-margin-top:10px; }
h1 { font-size:28px; } h2 { font-size:22px; margin-top:36px;
border-bottom:1px solid var(--line); padding-bottom:6px; }
code { background:var(--code-bg); border-radius:4px; padding:1px 5px;
       font:13.5px/1.5 ui-monospace, "SF Mono", Menlo, Consolas, monospace; }
pre { background:var(--code-bg); border:1px solid var(--line);
      border-radius:8px; padding:14px 16px; overflow-x:auto; }
pre code { background:none; padding:0; }
pre .k { color:#9940bd; } pre .s { color:#b35900; }
pre .c { color:var(--dim); font-style:italic; } pre .n { color:#2968c8; }
@media (prefers-color-scheme: dark) {
  pre .k { color:#c792ea; } pre .s { color:#e0a458; } pre .n { color:#82aaff; }
}
table { border-collapse:collapse; margin:16px 0; display:block;
        overflow-x:auto; }
th,td { border:1px solid var(--line); padding:6px 12px; font-size:14.5px;
        text-align:left; }
th { background:var(--code-bg); }
blockquote { margin:0; padding:2px 18px; border-left:3px solid var(--accent);
             color:var(--dim); }
img { max-width:100%; }
hr { border:none; border-top:1px solid var(--line); margin:28px 0; }
@media (max-width: 800px) { .layout { flex-direction:column; }
  nav.side { width:100%; border-right:none;
             border-bottom:1px solid var(--line); } main { padding:20px; } }
"""

PAGE = """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — neurodiffeq_tpu</title>
<link rel="stylesheet" href="{root}style.css">
</head>
<body>
<div class="layout">
<nav class="side">
<h1><a href="{root}index.html">neurodiffeq_tpu</a></h1>
{nav}
</nav>
<main>
{body}
</main>
</div>
</body>
</html>
"""


def _page_spec():
    """(output path, title, source path, kind) for every page; nav follows
    this order. kind: md | tutorial."""
    pages = [
        ('index.html', 'Overview', REPO / 'README.md', 'md', 'Project'),
        ('architecture.html', 'Architecture', REPO / 'ARCHITECTURE.md', 'md', 'Project'),
        ('benchmarks.html', 'Benchmark results', REPO / 'benchmarks' / 'RESULTS.md', 'md', 'Project'),
    ]
    guides = ['getting-started', 'advanced', 'internals', 'api',
              'migrating-from-neurodiffeq', 'faq']
    titles = {'getting-started': 'Getting started', 'advanced': 'Advanced',
              'internals': 'Internals', 'faq': 'FAQ', 'api': 'API overview',
              'migrating-from-neurodiffeq': 'Migrating from neurodiffeq'}
    for name in guides:
        p = REPO / 'docs' / (name + '.md')
        if p.exists():
            pages.append((name + '.html', titles[name], p, 'md', 'Guides'))
    for p in sorted((REPO / 'docs' / 'tutorials').glob('*.py')):
        title = p.stem.split('_', 1)[-1].replace('_', ' ').capitalize()
        pages.append(('tutorials/%s.html' % p.stem, 'Tutorial: ' + title,
                      p, 'tutorial', 'Tutorials'))
    api_readme = REPO / 'docs' / 'api' / 'README.md'
    if api_readme.exists():
        pages.append(('api/README.html', 'API index', api_readme, 'md', 'API reference'))
    for p in sorted((REPO / 'docs' / 'api').glob('*.md')):
        if p.name == 'README.md':
            continue
        pages.append(('api/%s.html' % p.stem, p.stem, p, 'md', 'API reference'))
    return pages


_HREF_RE = re.compile(r'(href|src)="([^"]+)"')


def _rewrite_links(body, src, out_name, src_to_out):
    """Map source-relative hrefs to their rendered output pages. Returns
    (body, dangling) where dangling lists internal links that neither map
    to a page nor resolve to a real repo file."""
    dangling = []
    out_depth = out_name.count('/')

    def rewrite(m):
        attr, href = m.group(1), m.group(2)
        if href.startswith(('http://', 'https://', '#', 'mailto:')):
            return m.group(0)
        target, _, frag = href.partition('#')
        frag = ('#' + frag) if frag else ''
        resolved = (src.parent / target).resolve()
        page = src_to_out.get(resolved)
        if page is not None:
            return '%s="%s%s%s"' % (attr, '../' * out_depth, page, frag)
        if resolved.exists():
            if 'docs/images/' in str(resolved):
                return '%s="%simages/%s%s"' % (attr, '../' * out_depth,
                                               resolved.name, frag)
            # pointer to repo source (examples/, tests/, ...): link to the
            # file's repo path as plain text reference
            return m.group(0)
        dangling.append('%s -> %s' % (out_name, href))
        return m.group(0)

    return _HREF_RE.sub(rewrite, body), dangling


def build_site(out_dir):
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / 'style.css').write_text(CSS)

    pages = _page_spec()
    built = {}
    dangling = []
    src_to_out = {src.resolve(): out_name for out_name, _, src, _, _ in pages}

    for out_name, title, src, kind, group in pages:
        links = []
        headings = []
        text = src.read_text()
        if kind == 'tutorial':
            body = render_tutorial(text, links, headings)
            rel = src.relative_to(REPO)
            # notebook mirror (generated at build time from the CI-executed
            # .py source, so the .ipynb can never drift from tested code)
            nb_name = 'tutorials/%s.ipynb' % src.stem
            nb_dest = out_dir / nb_name
            nb_dest.parent.mkdir(parents=True, exist_ok=True)
            nb_dest.write_text(json.dumps(percent_to_ipynb(text), indent=1))
            # phantom source path so the download link resolves in the
            # link-rewrite pass (the .ipynb exists only in the output dir)
            src_to_out[(src.parent / (src.stem + '.ipynb')).resolve()] = nb_name
            body = ('<p><em>Executable source: <code>%s</code> — run it '
                    'directly, open cell-by-cell in a percent-format editor, '
                    'or <a href="%s">download as a Jupyter notebook</a>.'
                    '</em></p>' % (rel, src.stem + '.ipynb')) + body
        else:
            body = render_markdown(text, links, headings)
        body, bad = _rewrite_links(body, src, out_name, src_to_out)
        dangling.extend(bad)
        built[out_name] = (title, body, group, headings)

    # images referenced from guide pages live in docs/images
    img_src = REPO / 'docs' / 'images'
    if img_src.exists():
        dest = out_dir / 'images'
        dest.mkdir(exist_ok=True)
        for img in img_src.iterdir():
            (dest / img.name).write_bytes(img.read_bytes())

    # nav html (one shared sidebar; hrefs made relative per page depth)
    def nav_for(depth, current):
        prefix = '../' * depth
        parts = []
        last_group = None
        for out_name, title, _, _, group in pages:
            if group != last_group:
                parts.append('<div class="group">%s</div>' % group)
                last_group = group
            cls = ' class="current"' if out_name == current else ''
            parts.append('<a%s href="%s%s">%s</a>'
                         % (cls, prefix, out_name, html.escape(title)))
        return '\n'.join(parts)

    for out_name, (title, body, group, headings) in built.items():
        depth = out_name.count('/')
        page = PAGE.format(title=html.escape(title), root='../' * depth,
                           nav=nav_for(depth, out_name), body=body)
        dest = out_dir / out_name
        dest.parent.mkdir(parents=True, exist_ok=True)
        dest.write_text(page)

    return built, dangling


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    ap.add_argument('--out', default=str(REPO / 'docs' / '_site'))
    args = ap.parse_args(argv)
    built, dangling = build_site(args.out)
    print('built %d pages -> %s' % (len(built), args.out))
    if dangling:
        print('DANGLING LINKS:')
        for d in dangling:
            print('  ' + d)
        return 1
    return 0


if __name__ == '__main__':
    sys.exit(main())
