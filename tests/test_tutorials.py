"""The tutorials (docs/tutorials/, the counterpart of the reference's
intro/how/advanced notebooks) must EXECUTE end-to-end — every code cell, every
inline assertion — at the quick settings. This is the CI execution the
reference never had for its notebooks."""
import os
import runpy

import pytest

TUTORIALS = sorted(
    f for f in os.listdir(os.path.join(os.path.dirname(__file__), '..', 'docs', 'tutorials'))
    if f.endswith('.py')
)


@pytest.mark.parametrize("name", TUTORIALS)
def test_tutorial_executes(name, monkeypatch, tmp_path):
    monkeypatch.setenv('NEURODIFF_TUTORIAL_QUICK', '1')
    monkeypatch.chdir(tmp_path)  # any artifacts land in tmp
    path = os.path.join(os.path.dirname(__file__), '..', 'docs', 'tutorials', name)
    runpy.run_path(path, run_name='__main__')
