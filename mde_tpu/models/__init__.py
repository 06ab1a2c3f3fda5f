"""Model registry.

``build_model(opt, min_depth, max_depth)`` maps the config's ``model.name``
(reference name space, §5.6 of SURVEY.md) to a flax module. Families are
registered as they are implemented; unknown names raise with the list of
available ones.
"""

from __future__ import annotations

from typing import Callable, Dict

_REGISTRY: Dict[str, Callable] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def available_models():
    return sorted(_REGISTRY)


def build_model(opt, min_depth: float, max_depth: float, **overrides):
    """opt is the full config; dispatch on opt['model']['name']."""
    model_opt = opt["model"] if "model" in opt else opt
    name = model_opt["name"]
    if name not in _REGISTRY:
        raise ValueError(
            f"Unknown model {name!r}. Available: {available_models()}")
    return _REGISTRY[name](model_opt, min_depth, max_depth, **overrides)


# --- registrations -----------------------------------------------------------

from .oda2.red_order_swin2 import ODA2OrderedSwin2RegModel
from .newcrfs.model import NewCRFDepth
from .adabins.model import UnetAdaptiveBins


@register("oda2_red_order_swin2")
def _build_oda2_red_order_swin2(model_opt, min_depth, max_depth, **overrides):
    return ODA2OrderedSwin2RegModel.build(model_opt, min_depth, max_depth, **overrides)


@register("newcrfs")
def _build_newcrfs(model_opt, min_depth, max_depth, **overrides):
    return NewCRFDepth.build(model_opt, min_depth, max_depth, **overrides)


@register("adabins")
def _build_adabins(model_opt, min_depth, max_depth, **overrides):
    return UnetAdaptiveBins.build(model_opt, min_depth, max_depth, **overrides)


from .depthformer.model import Depthformer


@register("depthformer")
def _build_depthformer(model_opt, min_depth, max_depth, **overrides):
    return Depthformer.build(model_opt, min_depth, max_depth, **overrides)


from .depthformer.versions import DepthformerV2, DepthformerV3, DepthformerV4


@register("depthformer_v2")
def _build_depthformer_v2(model_opt, min_depth, max_depth, **overrides):
    return DepthformerV2.build(2, model_opt, min_depth, max_depth, **overrides)


@register("depthformer_v3")
def _build_depthformer_v3(model_opt, min_depth, max_depth, **overrides):
    return DepthformerV3.build(model_opt, min_depth, max_depth, **overrides)


@register("depthformer_v4")
def _build_depthformer_v4(model_opt, min_depth, max_depth, **overrides):
    return DepthformerV4.build(model_opt, min_depth, max_depth, **overrides)


@register("depthformer_v5")
def _build_depthformer_v5(model_opt, min_depth, max_depth, **overrides):
    return DepthformerV2.build(5, model_opt, min_depth, max_depth, **overrides)


from .depthformer.luna_versions import DepthformerLuna

for _v in (6, 7, 8):
    def _make(version):
        def _build(model_opt, min_depth, max_depth, **overrides):
            return DepthformerLuna.build(version, model_opt, min_depth,
                                         max_depth, **overrides)
        return _build
    register(f"depthformer_v{_v}")(_make(_v))


from .oda.models import ODAConvModel, ODALunaModel, ODALunaClsModel, ODABinsModel


@register("oda_conv")
def _build_oda_conv(model_opt, min_depth, max_depth, **overrides):
    return ODAConvModel.build(model_opt, min_depth, max_depth, **overrides)


@register("oda_luna")
def _build_oda_luna(model_opt, min_depth, max_depth, **overrides):
    return ODALunaModel.build(model_opt, min_depth, max_depth, **overrides)


@register("oda_luna_cls")
def _build_oda_luna_cls(model_opt, min_depth, max_depth, **overrides):
    return ODALunaClsModel.build(model_opt, min_depth, max_depth, **overrides)


@register("oda_bins")
def _build_oda_bins(model_opt, min_depth, max_depth, **overrides):
    return ODABinsModel.build(model_opt, min_depth, max_depth, **overrides)


from .oda2.red_order_reg import ODA2OrderedRegModel
from .oda2.conv import ODA2ConvModel


@register("oda2_red_order_reg")
def _build_oda2_red_order_reg(model_opt, min_depth, max_depth, **overrides):
    return ODA2OrderedRegModel.build(model_opt, min_depth, max_depth,
                                     cls_head=False, **overrides)


@register("oda2_red_order_cls")
def _build_oda2_red_order_cls(model_opt, min_depth, max_depth, **overrides):
    return ODA2OrderedRegModel.build(model_opt, min_depth, max_depth,
                                     cls_head=True, **overrides)


@register("oda2_conv")
def _build_oda2_conv(model_opt, min_depth, max_depth, **overrides):
    return ODA2ConvModel.build(model_opt, min_depth, max_depth, **overrides)


from .oda.lion import ODALionModel
from .oda.lime import ODALimeModel
from .oda.jeju import ODAJejuModel


@register("oda_lion")
def _build_oda_lion(model_opt, min_depth, max_depth, **overrides):
    return ODALionModel.build(model_opt, min_depth, max_depth, **overrides)


@register("oda_lime")
def _build_oda_lime(model_opt, min_depth, max_depth, **overrides):
    return ODALimeModel.build(model_opt, min_depth, max_depth, **overrides)


@register("oda_jeju")
def _build_oda_jeju(model_opt, min_depth, max_depth, **overrides):
    return ODAJejuModel.build(model_opt, min_depth, max_depth, **overrides)


from .oda2.red_order_swin import ODA2OrderedSwinModel
from .oda2.red_reg import ODA2RedRegModel


@register("oda2_red_order_swin")
def _build_oda2_red_order_swin(model_opt, min_depth, max_depth, **overrides):
    return ODA2OrderedSwinModel.build(model_opt, min_depth, max_depth, **overrides)


@register("oda2_red_reg")
def _build_oda2_red_reg(model_opt, min_depth, max_depth, **overrides):
    return ODA2RedRegModel.build(model_opt, min_depth, max_depth, **overrides)


from .oda2.luna import ODA2LunaModel
from .oda2.red_luna import ODA2RedLunaRegModel
from .oda2.ksa import ODA2KSARegModel


@register("oda2_red_luna_reg")
def _build_oda2_red_luna_reg(model_opt, min_depth, max_depth, **overrides):
    return ODA2RedLunaRegModel.build(model_opt, min_depth, max_depth, **overrides)


@register("oda2_ksa_reg")
def _build_oda2_ksa_reg(model_opt, min_depth, max_depth, **overrides):
    return ODA2KSARegModel.build(model_opt, min_depth, max_depth, **overrides)


@register("oda2_luna_reg")
def _build_oda2_luna_reg(model_opt, min_depth, max_depth, **overrides):
    return ODA2LunaModel.build(model_opt, min_depth, max_depth,
                               cls_head=False, **overrides)


@register("oda2_luna_cls")
def _build_oda2_luna_cls(model_opt, min_depth, max_depth, **overrides):
    return ODA2LunaModel.build(model_opt, min_depth, max_depth,
                               cls_head=True, **overrides)
