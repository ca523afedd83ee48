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
