"""Import helper for DIFFERENTIAL tests against the reference code.

The reference repo (/root/reference, read-only) is imported at test
time so its torch modules can be run side-by-side with this
framework's flax models (same ported weights -> same outputs). Nothing
is copied; the reference package is executed as-is with its unavailable
heavy dependencies (torchvision, pretrainedmodels, skimage, ...)
replaced by permissive stubs — the SR model files only need torch.

Usage:
    from tests.ref_import import ref_models
    net_mod = ref_models('network_swinir')   # dlib.models.network_swinir
"""
import importlib
import importlib.abc
import importlib.machinery
import sys
import types

REFERENCE_ROOT = '/root/reference'

# Never stub these (the test subjects + their real deps).
_REAL_PREFIXES = ('dlib', 'torch', 'numpy', 'jax', 'flax', 'srcaco2',
                  'tests', 'scipy', 'cv2', 'yaml', 'einops')


class _StubMeta(type):
    """Metaclass making stub classes usable as base classes, dicts,
    iterables and callables at module-eval time."""
    def __getattr__(cls, k):
        return _new_stub()

    def __getitem__(cls, k):
        return _new_stub()

    def __setitem__(cls, k, v):
        pass

    def __iter__(cls):
        return iter(())

    def __contains__(cls, k):
        return False

    def __len__(cls):
        return 0


def _new_stub():
    class Stub(metaclass=_StubMeta):
        def __init__(self, *a, **k):
            pass

        def __getattr__(self, k):
            return _new_stub()

        def __getitem__(self, k):
            return _new_stub()

        def __setitem__(self, k, v):
            pass

        def __call__(self, *a, **k):
            return _new_stub()

        def __iter__(self):
            return iter(())

        def __contains__(self, k):
            return False

        def __len__(self):
            return 0
    return Stub


class _StubModule(types.ModuleType):
    __path__ = []

    def __bool__(self):
        # Optional-dependency guards (`if _winapi:` in stdlib
        # multiprocessing, `if cv2:` ...) must take the absent branch.
        return False

    def __getattr__(self, k):
        if k.startswith('__') and k.endswith('__'):
            raise AttributeError(k)
        return _new_stub()


class _StubLoader(importlib.abc.Loader):
    def create_module(self, spec):
        return _StubModule(spec.name)

    def exec_module(self, module):
        pass


def _from_reference_frame() -> bool:
    """True when the import statement being resolved lives in the
    reference repo's code. Keeps stubbing surgical: third-party
    packages with graceful optional-dependency handling (scipy/cython,
    stdlib platform guards) must see real ImportErrors."""
    f = sys._getframe(2)
    while f is not None:
        fn = f.f_code.co_filename
        if fn.startswith(REFERENCE_ROOT):
            return True
        if not ('importlib' in fn or fn.startswith('<frozen')):
            return False
        f = f.f_back
    return False


class _StubFinder(importlib.abc.MetaPathFinder):
    """Stubs any module that (a) is imported from reference-repo code
    and (b) the real finders cannot locate — the reference's model
    files pull in a long tail of viz/profiling deps irrelevant to the
    differential forward tests."""
    def find_spec(self, name, path=None, target=None):
        top = name.split('.')[0]
        if any(top == p for p in _REAL_PREFIXES):
            return None
        if not _from_reference_frame():
            return None
        for finder in sys.meta_path:
            if isinstance(finder, _StubFinder):
                continue
            try:
                if finder.find_spec(name, path, target) is not None:
                    return None
            except Exception:
                continue
        return importlib.machinery.ModuleSpec(
            name, _StubLoader(), is_package=True)


def _install_timm_shim():
    """The reference transformer files use a handful of REAL helpers
    from timm (to_2tuple, trunc_normal_, DropPath); a magic stub would
    silently break their math, so provide working implementations."""
    if 'timm.models.layers' in sys.modules and not isinstance(
            sys.modules['timm.models.layers'], _StubModule):
        return
    import itertools
    import collections.abc
    import torch
    from torch import nn

    def to_2tuple(x):
        if isinstance(x, collections.abc.Iterable) and \
                not isinstance(x, str):
            return tuple(x)
        return tuple(itertools.repeat(x, 2))

    def to_ntuple(n):
        def f(x):
            if isinstance(x, collections.abc.Iterable) and \
                    not isinstance(x, str):
                return tuple(x)
            return tuple(itertools.repeat(x, n))
        return f

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0, scale_by_keep=True):
            super().__init__()
            self.drop_prob = float(drop_prob or 0.0)
            self.scale_by_keep = scale_by_keep

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = x.new_empty(shape).bernoulli_(keep)
            if self.scale_by_keep:
                mask.div_(keep)
            return x * mask

    trunc_normal_ = torch.nn.init.trunc_normal_

    timm = types.ModuleType('timm')
    timm.__path__ = []
    models = types.ModuleType('timm.models')
    models.__path__ = []
    layers = types.ModuleType('timm.models.layers')
    layers.__path__ = []
    layers.to_2tuple = to_2tuple
    layers.to_ntuple = to_ntuple
    layers.DropPath = DropPath
    layers.trunc_normal_ = trunc_normal_
    timm.models = models
    models.layers = layers
    sys.modules['timm'] = timm
    sys.modules['timm.models'] = models
    sys.modules['timm.models.layers'] = layers


def _install_cpu_shim():
    """Some reference forwards hardcode .cuda() (network_srfbn.py:546);
    map it to a no-op in this CPU-only test environment."""
    import torch
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self


def _install_omegaconf_shim():
    """GRL builds its internal flag container with
    OmegaConf.create({...}) (network_grl.py:13); a magic stub silently
    mangles booleans (local_connection etc.), so provide a working
    attribute-dict implementation."""
    if 'omegaconf' in sys.modules and not isinstance(
            sys.modules['omegaconf'], _StubModule):
        return

    class _Node(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    class OmegaConf:
        @staticmethod
        def create(obj=None):
            if obj is None:
                return _Node()
            return _Node({k: (OmegaConf.create(v)
                              if isinstance(v, dict) else v)
                          for k, v in dict(obj).items()})

    mod = types.ModuleType('omegaconf')
    mod.OmegaConf = OmegaConf
    mod.DictConfig = _Node
    sys.modules['omegaconf'] = mod


def _install_fairscale_shim():
    """fairscale.nn.checkpoint_wrapper is an identity at eval."""
    if 'fairscale.nn' in sys.modules and not isinstance(
            sys.modules['fairscale.nn'], _StubModule):
        return
    fairscale = types.ModuleType('fairscale')
    fairscale.__path__ = []
    nn_mod = types.ModuleType('fairscale.nn')
    nn_mod.checkpoint_wrapper = lambda m, *a, **k: m
    fairscale.nn = nn_mod
    sys.modules['fairscale'] = fairscale
    sys.modules['fairscale.nn'] = nn_mod


def install():
    if not any(isinstance(f, _StubFinder) for f in sys.meta_path):
        sys.meta_path.insert(0, _StubFinder())
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _install_timm_shim()
    _install_cpu_shim()
    _install_omegaconf_shim()
    _install_fairscale_shim()


def ref_models(module_name: str):
    """Import dlib.models.<module_name> from the reference repo."""
    install()
    return importlib.import_module(f'dlib.models.{module_name}')
