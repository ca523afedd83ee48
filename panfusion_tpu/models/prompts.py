"""Prompt assembly (host-side strings), parity with the reference PanoBase
(models/pano/PanoGenerator.py:16-58)."""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence


@dataclass
class PromptConfig:
    pano_prompt_prefix: str = ""
    pers_prompt_prefix: str = ""
    mv_pano_prompt: bool = False
    copy_pano_prompt: bool = True  # PanFusion default (PanFusion.py:16)


def _add_prefix(prefix: str, prompt: str) -> str:
    if prompt == "" or prefix == "":
        return prompt
    return " ".join([prefix, prompt])


def get_pano_prompt(cfg: PromptConfig, batch: Dict) -> List[str]:
    """One prompt per sample. With mv_pano_prompt, joins the per-view
    captions with '. ' (empty if the sample's pano_prompt is empty)."""
    if cfg.mv_pano_prompt:
        prompts = list(map(list, zip(*batch["prompt"])))
        pano_prompt = [
            ". ".join(p1) if p2 else ""
            for p1, p2 in zip(prompts, batch["pano_prompt"])
        ]
    else:
        pano_prompt = list(batch["pano_prompt"])
    return [_add_prefix(cfg.pano_prompt_prefix, p) for p in pano_prompt]


def get_pers_prompt(cfg: PromptConfig, batch: Dict, num_cameras: int) -> List[str]:
    """m prompts per sample, flattened (b*m). With copy_pano_prompt the pano
    prompt is replicated to every view."""
    if cfg.copy_pano_prompt:
        prompts = sum([[p] * num_cameras for p in batch["pano_prompt"]], [])
    else:
        prompts = sum(map(list, zip(*batch["prompt"])), [])
    return [_add_prefix(cfg.pers_prompt_prefix, p) for p in prompts]
