"""Packaging guards: every console script in pyproject.toml resolves.

The reference ships bare scripts (train_dist.py, evaluate.py, demo_batch.py
at the repo root); here the tools are a package (offsetguided_tpu.cli)
installed as og-* console scripts, with tools/*.py shims kept for source
checkouts. These tests pin the wiring so a module rename can't silently
break either entry path.
"""
import importlib
import pathlib
import tomllib

REPO = pathlib.Path(__file__).resolve().parent.parent


def _scripts():
    with open(REPO / 'pyproject.toml', 'rb') as f:
        return tomllib.load(f)['project']['scripts']


def test_every_console_script_resolves():
    scripts = _scripts()
    assert scripts, 'pyproject must declare console scripts'
    for name, target in scripts.items():
        module, func = target.split(':')
        assert module.startswith('offsetguided_tpu.cli.')
        mod = importlib.import_module(module)
        assert callable(getattr(mod, func)), f'{name} -> {target}'


def test_every_cli_module_has_a_script_and_a_shim():
    targets = {t.split(':')[0] for t in _scripts().values()}
    cli_dir = REPO / 'offsetguided_tpu' / 'cli'
    for py in cli_dir.glob('*.py'):
        if py.name == '__init__.py':
            continue
        module = f'offsetguided_tpu.cli.{py.stem}'
        assert module in targets, f'{module} missing from [project.scripts]'
        shim = REPO / 'tools' / py.name
        assert shim.exists(), f'tools/{py.name} shim missing'
        text = shim.read_text()
        assert f'from {module} import main' in text


def test_shim_reexports_main():
    # the multihost test (and user code) does `from tools.train import main`
    import sys
    sys.path.insert(0, str(REPO))
    try:
        from tools.train import main as shim_main
        from offsetguided_tpu.cli.train import main as pkg_main
        assert shim_main is pkg_main
    finally:
        sys.path.remove(str(REPO))
