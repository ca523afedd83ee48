from .dual_unet import DualUNet
from .panfusion import PanFusion, PanFusionConfig, tensor_to_image
from .prompts import PromptConfig, get_pano_prompt, get_pers_prompt

__all__ = [
    "DualUNet",
    "PanFusion",
    "PanFusionConfig",
    "PromptConfig",
    "get_pano_prompt",
    "get_pers_prompt",
    "tensor_to_image",
]


def __getattr__(name):
    # heavier task modules load lazily (they pull in the metric stack)
    if name in ("FAED", "FAEDConfig"):
        from . import faed

        return getattr(faed, name)
    if name in ("HorizonNet", "HorizonNetConfig", "LayoutConsistency"):
        from . import horizonnet

        return getattr(horizonnet, name)
    if name in ("EvalPanoGen", "EvalConfig"):
        from . import eval_pano_gen

        return getattr(eval_pano_gen, name)
    if name in ("MvDiffusion", "MvDiffusionConfig"):
        from . import mvdiffusion

        return getattr(mvdiffusion, name)
    raise AttributeError(name)
