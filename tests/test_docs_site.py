"""Docs-site build smoke test + site-wide link check.

The reference ships a buildable sphinx site (``/root/reference/docs/conf.py``,
``index.rst``); ours is built by the dependency-free ``docs/build_site.py``.
This test builds the full site into a tmp dir and asserts structure, link
integrity, and renderer correctness on the markdown subset the docs use.
"""
import re
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / 'docs'))
import build_site  # noqa: E402


@pytest.fixture(scope='module')
def site(tmp_path_factory):
    out = tmp_path_factory.mktemp('site')
    built, dangling = build_site.build_site(out)
    return out, built, dangling


def test_site_builds_all_pages(site):
    out, built, dangling = site
    assert dangling == []
    # landing page + architecture + benchmarks + 6 guides + 5 tutorials
    # + API index + 20 API module pages
    assert len(built) >= 30
    for page in ['index.html', 'getting-started.html', 'architecture.html',
                 'benchmarks.html', 'tutorials/01_intro.html',
                 'api/solvers.html', 'api/fields.html']:
        assert (out / page).exists(), page
    assert (out / 'style.css').exists()


def test_every_internal_href_resolves(site):
    out, _, _ = site
    href_re = re.compile(r'(?:href|src)="([^"]+)"')
    for page in out.rglob('*.html'):
        text = page.read_text()
        for href in href_re.findall(text):
            if href.startswith(('http://', 'https://', '#', 'mailto:')):
                continue
            target = href.partition('#')[0]
            resolved = (page.parent / target).resolve()
            repo_fallback = (build_site.REPO / target).resolve()
            assert resolved.exists() or repo_fallback.exists(), \
                '%s -> %s' % (page.relative_to(out), href)


def test_nav_and_content_render(site):
    out, _, _ = site
    index = (out / 'index.html').read_text()
    assert 'class="current"' in index
    for group in ['Project', 'Guides', 'Tutorials', 'API reference']:
        assert '<div class="group">%s</div>' % group in index

    tut = (out / 'tutorials/01_intro.html').read_text()
    assert tut.count('<pre') >= 3          # code cells rendered
    assert '<span class="k">import</span>' in tut  # highlighting active

    bench = (out / 'benchmarks.html').read_text()
    assert bench.count('<table') >= 5      # result tables rendered

    gs = (out / 'getting-started.html').read_text()
    assert '**' not in gs and '](' not in gs  # no raw markdown leaks


def test_markdown_renderer_units():
    md = render = build_site.render_markdown
    assert render('**bold** and *em* and `code`') == \
        '<p><strong>bold</strong> and <em>em</em> and <code>code</code></p>'
    # code spans are not further formatted
    assert '<strong>' not in render('`**not bold**`')
    # rst roles from generated API docs render as code
    assert '<code>Field</code>' in render(':class:`Field` does things')
    # fenced block keeps literal markdown
    out = render('```\n**raw**\n```')
    assert '<pre' in out and '**raw**' in out
    # tables
    out = render('| a | b |\n|---|---|\n| 1 | 2 |')
    assert '<th>a</th>' in out and '<td>2</td>' in out
    # nested lists
    out = render('- top\n  - inner\n- top2')
    assert out.count('<ul>') == 2 and '<li>inner</li>' in out
    # headings get stable anchors
    out = render('## Hello `world` there')
    assert 'id="hello-world-there"' in out


def test_tutorial_renderer_units():
    src = ('# %% [markdown]\n'
           '# # Title\n'
           '# Some *prose*.\n'
           '# %%\n'
           'x = 1  # comment\n')
    out = build_site.render_tutorial(src)
    assert '<h1 id="title">Title</h1>' in out
    assert '<em>prose</em>' in out
    assert '<span class="c"># comment</span>' in out


def test_tutorial_notebook_mirrors(site):
    """Each percent-format tutorial gets a generated .ipynb mirror in the
    built site (the notebook artifact class the reference ships as
    docs/intro.ipynb etc.), valid nbformat-4 JSON with both cell types,
    linked from the tutorial page."""
    import json
    out, built, _ = site
    stems = ['01_intro', '02_how_it_works', '03_advanced']
    for stem in stems:
        nb = json.loads((out / 'tutorials' / (stem + '.ipynb')).read_text())
        assert nb['nbformat'] == 4
        kinds = {c['cell_type'] for c in nb['cells']}
        assert kinds == {'markdown', 'code'}
        # round-trip: joined code-cell sources reproduce the executable code
        py_src = (Path(build_site.REPO) / 'docs' / 'tutorials'
                  / (stem + '.py')).read_text()
        for cell in nb['cells']:
            if cell['cell_type'] == 'code':
                assert ''.join(cell['source']).strip() in py_src
        page = (out / 'tutorials' / (stem + '.html')).read_text()
        assert stem + '.ipynb' in page


def test_percent_to_ipynb_units():
    nb = build_site.percent_to_ipynb(
        "# %% [markdown]\n# # Title\n# prose `x`\n\n# %%\nx = 1\ny = 2\n")
    assert [c['cell_type'] for c in nb['cells']] == ['markdown', 'code']
    assert nb['cells'][0]['source'] == ['# Title\n', 'prose `x`']
    assert nb['cells'][1]['source'] == ['x = 1\n', 'y = 2']
