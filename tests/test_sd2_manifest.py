"""SD2 naming-contract tests (VERDICT round 1, Next #2).

The full stable-diffusion-2-base UNet/VAE/CLIP state_dict key lists are
deterministic; sd2_manifest.py encodes them from the documented diffusers
module layout. These tests synthesize a state_dict with exactly those
names+shapes, run tools/convert_ckpt.py over it, and assert the converter
maps EVERY key with zero unmatched leaves both ways against the live flax
models — including the rank-4 LoRA processor keys and the legacy
``to_q.lora_layer -> processor.to_q_lora`` remap the reference applies on
checkpoint load (models/pano/PanoGenerator.py:101-107).
"""
import sys
import pathlib

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))

import jax
import jax.numpy as jnp
from flax import traverse_util

import convert_ckpt as cc  # noqa: E402
import sd2_manifest as man  # noqa: E402


def _synthetic_sd(manifest):
    # broadcast-zero arrays: full-size key shapes without 3.5 GB of RAM
    return {k: np.broadcast_to(np.zeros((), np.float32), s)
            for k, s in manifest.items()}


def _shape_map(tree):
    return {"/".join(map(str, k)): tuple(v.shape)
            for k, v in traverse_util.flatten_dict(tree).items()}


def _assert_same_tree(converted, flax_params, what):
    got = _shape_map(converted)
    want = _shape_map(flax_params)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing, f"{what}: converter missed {len(missing)}: {missing[:5]}"
    assert not extra, f"{what}: converter invented {len(extra)}: {extra[:5]}"
    bad = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not bad, f"{what}: shape mismatches: {dict(list(bad.items())[:5])}"


class TestUNetManifest:
    def _flax_shapes(self, lora_rank):
        from panfusion_tpu.nn.unet import UNet2DCondition

        unet = UNet2DCondition(lora_rank=lora_rank)
        return jax.eval_shape(
            lambda: unet.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 8, 16, 4)),
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 77, 1024)),
            )
        )["params"]

    def test_every_key_maps(self):
        manifest = man.sd2_unet_keys()
        assert len(manifest) == 686  # the real SD2 UNet tensor count
        unmapped = [k for k in manifest if cc._unet_key(k) is None]
        assert not unmapped, f"unmapped: {unmapped[:5]}"

    def test_converted_tree_equals_flax_init(self):
        converted = cc.convert_unet(_synthetic_sd(man.sd2_unet_keys()))
        _assert_same_tree(converted, self._flax_shapes(0), "unet")

    def test_lora_rank4_tree_equals_flax_init(self):
        converted = cc.convert_unet(_synthetic_sd(man.sd2_unet_keys(4)))
        _assert_same_tree(converted, self._flax_shapes(4), "unet+lora")

    def test_legacy_lora_spelling_remaps(self):
        """PanoGenerator.py:101-107: old ckpts spell LoRA keys
        ``...to_q.lora_layer.down.weight``; the converter must land them on
        the same leaves as the processor spelling."""
        manifest = man.sd2_unet_keys(4)
        legacy = {}
        for k, s in manifest.items():
            if ".processor." in k:
                # attn1.processor.to_q_lora.down.weight
                #   -> attn1.to_q.lora_layer.down.weight
                # (to_out's module path carries the Sequential index:
                #  to_out.0.lora_layer — PanoGenerator.py:104)
                k = k.replace(".processor.", ".")
                k = k.replace("to_out_lora.", "to_out.0_lora.")
                k = k.replace("_lora.", ".lora_layer.")
                k = k.replace("to_out.0.lora_layer", "to_out.0.lora_layer")
            legacy[k] = s
        converted = cc.convert_unet(_synthetic_sd(legacy))
        _assert_same_tree(converted, self._flax_shapes(4), "unet legacy lora")


class TestVAEManifest:
    def test_every_key_maps_and_tree_matches(self):
        from panfusion_tpu.nn.vae import AutoencoderKL

        manifest = man.sd2_vae_keys()
        assert len(manifest) == 248  # the real SD2 VAE tensor count
        unmapped = [k for k in manifest if cc._vae_key(k, 4) is None]
        assert not unmapped, f"unmapped: {unmapped[:5]}"
        converted = cc.convert_vae(_synthetic_sd(manifest))
        vae = AutoencoderKL()
        flax_params = jax.eval_shape(
            lambda: vae.init(
                {"params": jax.random.PRNGKey(0)},
                jnp.zeros((1, 32, 32, 3)),
                jax.random.PRNGKey(1),
            )
        )["params"]
        _assert_same_tree(converted, flax_params, "vae")


class TestCLIPManifest:
    def test_manifest_matches_transformers(self):
        """The static CLIP manifest must equal what the installed
        transformers library actually produces for the SD2 text config."""
        torch = pytest.importorskip("torch")
        from transformers import CLIPTextConfig, CLIPTextModel

        cfg = CLIPTextConfig(
            vocab_size=49408, hidden_size=1024, intermediate_size=4096,
            num_hidden_layers=23, num_attention_heads=16,
            max_position_embeddings=77, hidden_act="gelu")
        with torch.device("meta"):
            hf = CLIPTextModel(cfg)
        real = {k: tuple(v.shape) for k, v in hf.state_dict().items()
                if "position_ids" not in k}
        assert real == man.sd2_clip_text_keys()

    def test_every_key_maps_and_tree_matches(self):
        from panfusion_tpu.nn.clip import CLIPTextModel

        manifest = man.sd2_clip_text_keys()
        converted, _ = cc.convert_clip_text(_synthetic_sd(manifest))
        flax_params = jax.eval_shape(
            lambda: CLIPTextModel().init(
                jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))
        )["params"]
        _assert_same_tree(converted, flax_params, "clip_text")


class TestPanFusionCkptManifest:
    def test_full_checkpoint_surface(self):
        """A synthetic reference lightning checkpoint with the exact
        mv_base_model.{unet,pano_unet,cp_blocks_*} key surface (LoRA rank
        4 on both UNets, 7 WarpAttn blocks at SD2 dims) converts onto the
        dual-model param tree with nothing skipped or invented."""
        from panfusion_tpu.nn.unet import UNet2DCondition
        from panfusion_tpu.nn.epp import WarpAttn
        from panfusion_tpu.models.epp import (build_masks, build_coords,
                                              _pack_masks)
        from panfusion_tpu.nn.epp import EPPSite

        sd = {}
        for k, s in man.sd2_unet_keys(4).items():
            sd[f"mv_base_model.unet.{k}"] = np.broadcast_to(
                np.zeros((), np.float32), s)
            sd[f"mv_base_model.pano_unet.{k}"] = np.broadcast_to(
                np.zeros((), np.float32), s)
        warp_dims = {"cp_blocks_encoder.0": 320, "cp_blocks_encoder.1": 640,
                     "cp_blocks_encoder.2": 1280, "cp_blocks_mid": 1280,
                     "cp_blocks_decoder.0": 1280, "cp_blocks_decoder.1": 640,
                     "cp_blocks_decoder.2": 320}
        for blk, c in warp_dims.items():
            p = f"mv_base_model.{blk}.transformer"
            for norm in ("norm1", "norm2"):
                sd[f"{p}.{norm}.weight"] = np.zeros((c,), np.float32)
                sd[f"{p}.{norm}.bias"] = np.zeros((c,), np.float32)
            for proj in ("to_q", "to_k", "to_v"):
                sd[f"{p}.attn1.{proj}.weight"] = np.broadcast_to(
                    np.zeros((), np.float32), (c, c))
            sd[f"{p}.attn1.to_out.weight"] = np.broadcast_to(
                np.zeros((), np.float32), (c, c))
            sd[f"{p}.attn1.to_out.bias"] = np.zeros((c,), np.float32)
            sd[f"{p}.ff.net.0.proj.weight"] = np.broadcast_to(
                np.zeros((), np.float32), (8 * c, c))
            sd[f"{p}.ff.net.0.proj.bias"] = np.zeros((8 * c,), np.float32)
            sd[f"{p}.ff.net.2.weight"] = np.broadcast_to(
                np.zeros((), np.float32), (c, 4 * c))
            sd[f"{p}.ff.net.2.bias"] = np.zeros((c,), np.float32)
            sd[f"mv_base_model.{blk}.pe.freq_bands"] = np.zeros(
                (c // 4,), np.float32)
        # the reference strips eval_metrics.* on save; converter must too
        sd["eval_metrics.faed.real_sum"] = np.zeros((2048,), np.float32)

        tree = cc.convert_panfusion_ckpt(sd)["dual"]["params"]
        got = _shape_map(tree)

        unet_shapes = _shape_map(cc.convert_unet(
            _synthetic_sd(man.sd2_unet_keys(4))))
        want = {}
        for k, s in unet_shapes.items():
            want[f"unet/{k}"] = s
            want[f"pano_unet/{k}"] = s
        for blk, c in warp_dims.items():
            b = blk.replace(".", "_")
            want[f"{b}/transformer/norm1/scale"] = (c,)
            want[f"{b}/transformer/norm1/bias"] = (c,)
            want[f"{b}/transformer/norm2/scale"] = (c,)
            want[f"{b}/transformer/norm2/bias"] = (c,)
            for proj in ("to_q", "to_k", "to_v"):
                want[f"{b}/transformer/attn1/{proj}/base/kernel"] = (c, c)
            want[f"{b}/transformer/attn1/to_out/kernel"] = (c, c)
            want[f"{b}/transformer/attn1/to_out/bias"] = (c,)
            want[f"{b}/transformer/ff/net_0/proj/kernel"] = (c, 8 * c)
            want[f"{b}/transformer/ff/net_0/proj/bias"] = (8 * c,)
            want[f"{b}/transformer/ff/net_2/kernel"] = (4 * c, c)
            want[f"{b}/transformer/ff/net_2/bias"] = (c,)
        assert got == want

        # and the WarpAttn subset must coincide with the live module tree
        site = EPPSite(
            *(_pack_masks(*(x[None] for x in build_masks(
                (2, 2), (4, 8), jnp.full((1,), 90.0), jnp.zeros(1),
                jnp.zeros(1))), (4, 8), (2, 2))),
            pers_coords=build_coords((2, 2), (4, 8), jnp.full((1,), 90.0),
                                     jnp.zeros(1), jnp.zeros(1))[0],
            equi_coords=build_coords((2, 2), (4, 8), jnp.full((1,), 90.0),
                                     jnp.zeros(1), jnp.zeros(1))[1],
        )
        live = jax.eval_shape(
            lambda: WarpAttn(320).init(
                jax.random.PRNGKey(0), jnp.zeros((1, 2, 2, 320)),
                jnp.zeros((1, 4, 8, 320)), site)
        )["params"]
        live_paths = set(_shape_map(live))
        got_warp = {k[len("cp_blocks_encoder_0/"):]
                    for k in got if k.startswith("cp_blocks_encoder_0/")}
        assert got_warp == live_paths
