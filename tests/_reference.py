"""Loader for the PyTorch/CUDA reference implementation (CPU-only, test oracle).

Installs a no-op `type_enforced` stub (the package is not installed here;
its decorators are runtime type checks only) and imports
/root/reference/fsw_embedding.py with the CUDA library disabled, so the
reference's pure-torch paths serve as the golden model for parity tests.
"""
import importlib.util
import os
import sys
import types

REFERENCE_PATH = os.environ.get('FSW_REFERENCE', '/root/reference')


def _install_type_enforced_stub():
    if 'type_enforced' in sys.modules:
        return
    mod = types.ModuleType('type_enforced')

    class Enforcer:
        def __init__(self, *a, **k):
            pass

        def __call__(self, obj):
            return obj

    mod.Enforcer = Enforcer
    sys.modules['type_enforced'] = mod


_ref_module = None


def load_reference():
    """Import the reference fsw_embedding module (cached). Returns None if
    unavailable (e.g. torch missing)."""
    global _ref_module
    if _ref_module is not None:
        return _ref_module
    path = os.path.join(REFERENCE_PATH, 'fsw_embedding.py')
    if not os.path.exists(path):
        return None
    try:
        import torch  # noqa: F401
    except ImportError:
        return None
    _install_type_enforced_stub()
    spec = importlib.util.spec_from_file_location('ref_fsw_embedding', path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules['ref_fsw_embedding'] = mod
    spec.loader.exec_module(mod)
    _ref_module = mod
    return mod


def make_reference_embedding(**kwargs):
    """Construct a reference FSW_embedding on CPU without the CUDA lib."""
    import torch
    ref = load_reference()
    kwargs.setdefault('device', torch.device('cpu'))
    kwargs.setdefault('dtype', torch.float64)
    kwargs.setdefault('load_custom_cuda_lib', False)
    return ref.FSW_embedding(**kwargs)
