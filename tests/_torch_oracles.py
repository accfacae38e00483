"""Import helpers for using the reference's torch modules as NUMERICAL TEST
ORACLES for weight-converter validation (SURVEY §7 hard-part #4: layout
fidelity is the classic silent-parity killer).

The reference tree at /root/reference is read-only public content; we import
its torch module DEFINITIONS (never weights, never code copied into this
repo) to generate golden activations: build the torch module with random
init, run a fixed input, convert the state_dict with our converter, run our
Flax graph, and compare numerically.

Heavy/unavailable dependencies (smplx, utils3d, pyrender, detectron2...) are
stubbed with auto-attribute modules — the oracle submodules we instantiate
never call into them.
"""

from __future__ import annotations

import importlib
import os
import sys
import types

REFERENCE = os.environ.get("FOHO_REFERENCE_DIR", "/root/reference")


class _AutoModule(types.ModuleType):
    """Module whose attributes materialize on demand (stub for unused deps)."""

    def __init__(self, name):
        super().__init__(name)
        self.__path__ = []
        # a real spec so importlib.util.find_spec on a stub doesn't raise
        from importlib.machinery import ModuleSpec

        self.__spec__ = ModuleSpec(name, None, is_package=True)

    def __call__(self, *args, **kwargs):
        # used as a decorator (e.g. rank_zero_only): pass the fn through
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]
        return _AutoModule(self.__name__ + "()")

    def __getattr__(self, item):
        if item.startswith("__"):
            raise AttributeError(item)
        if item[0].isupper():
            # CamelCase access is a class (something may subclass it)
            cls = type(item, (), {"__init__": lambda self, *a, **k: None})
            setattr(self, item, cls)
            return cls
        sub = _AutoModule(f"{self.__name__}.{item}")
        setattr(self, item, sub)
        sys.modules.setdefault(sub.__name__, sub)
        return sub


_STUBS = ("smplx", "utils3d", "pyrender", "detectron2", "chumpy",
          "vitpose_model", "mmcv", "mmpose", "yacs", "pytorch_lightning",
          "webdataset", "braceexpand", "timm", "skimage", "trimesh",
          "cv2", "matplotlib", "hydra", "omegaconf", "lightning",
          "torchvision")


class _StubLoader:
    def create_module(self, spec):
        return _AutoModule(spec.name)

    def exec_module(self, module):
        pass


class _StubFinder:
    """Meta-path finder serving _AutoModule for any stubbed package subtree
    (handles `from smplx.lbs import ...`, which bypasses __getattr__)."""

    def find_spec(self, fullname, path=None, target=None):
        if fullname.split(".")[0] not in _STUBS:
            return None
        from importlib.machinery import ModuleSpec

        spec = ModuleSpec(fullname, _StubLoader(), is_package=True)
        return spec


def _install_stubs():
    import importlib.util

    for name in _STUBS:
        if name in sys.modules:
            continue
        # never shadow a REAL installed package (stubbing cv2 broke the
        # HeuristicBundle for every later test in the same pytest process)
        if importlib.util.find_spec(name) is not None:
            continue
        sys.modules[name] = _AutoModule(name)
    if not any(isinstance(f, _StubFinder) for f in sys.meta_path):
        sys.meta_path.append(_StubFinder())
    # real implementations for the few timm helpers the oracle code calls
    import torch

    layers = sys.modules["timm"].models.layers

    def to_2tuple(x):
        return tuple(x) if isinstance(x, (tuple, list)) else (x, x)

    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    layers.drop_path = lambda x, *a, **k: x


def install_diffusers_stub():
    """Functional diffusers shims for the reference's patched scheduler
    (third_party_patches/hy3dgen/shapegen/schedulers.py): ConfigMixin with a
    working register_to_config, plus SchedulerMixin/BaseOutput/logging."""
    import importlib.util

    if "diffusers" in sys.modules and not isinstance(
            sys.modules["diffusers"], _AutoModule):
        return
    # never shadow a REAL installed package (same guard as _install_stubs;
    # a skeleton stub in sys.modules would break later real imports)
    if "diffusers" not in sys.modules and \
            importlib.util.find_spec("diffusers") is not None:
        return
    import functools
    import inspect
    import logging as _pylogging
    from types import SimpleNamespace

    d = _AutoModule("diffusers")

    class ConfigMixin:
        pass

    class SchedulerMixin:
        pass

    def register_to_config(init):
        @functools.wraps(init)
        def wrapped(self, *args, **kwargs):
            ba = inspect.signature(init).bind(self, *args, **kwargs)
            ba.apply_defaults()
            cfg = {k: v for k, v in ba.arguments.items() if k != "self"}
            self.config = SimpleNamespace(**cfg)
            return init(self, *args, **kwargs)

        return wrapped

    class BaseOutput:
        def __init_subclass__(cls, **kw):
            super().__init_subclass__(**kw)

    d.configuration_utils.ConfigMixin = ConfigMixin
    d.configuration_utils.register_to_config = register_to_config
    d.schedulers.scheduling_utils.SchedulerMixin = SchedulerMixin
    d.utils.BaseOutput = BaseOutput
    d.utils.logging = SimpleNamespace(
        get_logger=lambda *a, **k: _pylogging.getLogger("stub"))
    for name in ("diffusers", "diffusers.configuration_utils",
                 "diffusers.schedulers", "diffusers.schedulers.scheduling_utils",
                 "diffusers.utils"):
        mod = d
        for part in name.split(".")[1:]:
            mod = getattr(mod, part)
        sys.modules[name] = mod


def import_reference_pipelines():
    """-> the reference's patched pipelines module (guidance math fns only —
    model classes need real pytorch3d/kaolin and stay unusable)."""
    global _STUBS
    _STUBS = tuple(_STUBS) + ("pytorch3d", "kaolin", "kiui", "utilz")
    _install_stubs()
    install_diffusers_stub()
    import importlib.util

    import torch

    tu = sys.modules.get("diffusers.utils.torch_utils")
    if tu is None:
        import types

        tu = types.ModuleType("diffusers.utils.torch_utils")
        tu.randn_tensor = lambda *a, **k: torch.randn(*a)
        sys.modules["diffusers.utils"].torch_utils = tu
        sys.modules["diffusers.utils.torch_utils"] = tu

    path = os.path.join(
        REFERENCE, "third_party_patches/hy3dgen/shapegen/pipelines.py")
    spec = importlib.util.spec_from_file_location("ref_pipelines", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def import_reference_scheduler():
    """-> the reference's patched FlowMatchEulerDiscreteScheduler module."""
    _install_stubs()
    install_diffusers_stub()
    import importlib.util

    path = os.path.join(
        REFERENCE, "third_party_patches/hy3dgen/shapegen/schedulers.py")
    spec = importlib.util.spec_from_file_location("ref_schedulers", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)


def import_hamer_oracle():
    """-> (mano_head module, vit backbone module) from the reference tree."""
    _install_stubs()
    path = os.path.join(REFERENCE, "third_party/estimator/hamer")
    if path not in sys.path:
        sys.path.insert(0, path)
    mano_head = importlib.import_module("hamer.models.heads.mano_head")
    vit = importlib.import_module("hamer.models.backbones.vit")
    return mano_head, vit


def import_moge_oracle():
    """-> moge.model.modules from the reference tree."""
    _install_stubs()
    path = os.path.join(REFERENCE, "third_party/MoGe")
    if path not in sys.path:
        sys.path.insert(0, path)
    return importlib.import_module("moge.model.modules")


def import_dinov2_oracle():
    """-> the vendored DINOv2 vision_transformer module (MoGe's backbone;
    xformers-free fallback path)."""
    _install_stubs()
    os.environ.setdefault("XFORMERS_DISABLED", "1")
    path = os.path.join(REFERENCE, "third_party/MoGe")
    if path not in sys.path:
        sys.path.insert(0, path)
    return importlib.import_module("moge.model.dinov2.models.vision_transformer")


def import_frcnn_resnet_oracle():
    """-> the hand_object_detector resnet module (ResNet/Bottleneck classes),
    with its package-internal imports stubbed (cfg, _fasterRCNN, roi layers
    are not needed for the backbone definition)."""
    _install_stubs()
    import importlib.util

    for name in ("model", "model.utils", "model.utils.config",
                 "model.faster_rcnn", "model.faster_rcnn.faster_rcnn"):
        sys.modules.setdefault(name, _AutoModule(name))
    sys.modules["model.faster_rcnn.faster_rcnn"]._fasterRCNN = type(
        "_fasterRCNN", (), {"__init__": lambda self, *a, **k: None})
    path = os.path.join(
        REFERENCE,
        "third_party/estimator/hand_object_detector/lib/model/faster_rcnn/resnet.py")
    spec = importlib.util.spec_from_file_location("ref_hod_resnet", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_hod_resnet"] = mod
    spec.loader.exec_module(mod)
    return mod
