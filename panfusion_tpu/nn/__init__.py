from .clip import CLIPTextModel, CLIPVisionModel
from .epp import EPPSite, EPPTransformerBlock, WarpAttn, spherical_pe
from .scheduler import DDIMSchedule, add_noise, ddim_step, make_ddim_schedule
from .tokenizer import CLIPTokenizer, HashTokenizer, load_tokenizer
from .unet import UNet2DCondition
from .vae import SD_VAE_SCALING_FACTOR, AutoencoderKL

__all__ = [
    "CLIPTextModel",
    "CLIPVisionModel",
    "EPPSite",
    "EPPTransformerBlock",
    "WarpAttn",
    "spherical_pe",
    "DDIMSchedule",
    "add_noise",
    "ddim_step",
    "make_ddim_schedule",
    "CLIPTokenizer",
    "HashTokenizer",
    "load_tokenizer",
    "UNet2DCondition",
    "AutoencoderKL",
    "SD_VAE_SCALING_FACTOR",
]
