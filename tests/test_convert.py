"""Checkpoint-converter mapping tests.

Strategy: walk the tiny flax param trees, derive the torch/diffusers
state_dict key for every leaf with an inverse-naming oracle, synthesize a
state_dict of matching (transposed) shapes, run the converter, and assert
the result reproduces the flax tree exactly (paths AND shapes). This pins
the naming contract without needing real weight files (no network here).
"""
import re

import numpy as np
import pytest

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))
import convert_ckpt as cc  # noqa: E402

from flax import traverse_util  # noqa: E402


def tree_paths(tree):
    return {
        "/".join(k): v.shape
        for k, v in traverse_util.flatten_dict(tree).items()
    }


def unet_flax_to_torch(path: str) -> str:
    """Inverse naming oracle for nn/unet.py param paths."""
    k = path
    is_lora = "/lora_down/" in k or "/lora_up/" in k
    direction = "down" if "/lora_down/" in k else "up"
    k = re.sub(r"/(lora_down|lora_up)/kernel$", "/kernel", k)
    k = k.replace("/base/kernel", "/kernel").replace("/base/bias", "/bias")

    k = re.sub(r"(down_blocks|up_blocks)_(\d+)", r"\1.\2", k)
    k = re.sub(r"(resnets|attentions|downsamplers|upsamplers)_(\d+)", r"\1.\2", k)
    k = k.replace("blocks_0", "transformer_blocks.0")
    k = k.replace("net_0", "net.0").replace("net_2", "net.2")
    k = k.replace("/", ".")
    m = re.search(r"\.(to_q|to_k|to_v|to_out)\.(kernel|bias)$", k)
    if "transformer_blocks" in k and m and m.group(1) == "to_out":
        k = k.replace(".to_out.", ".to_out.0.")
    if is_lora:
        name = m.group(1)
        k = re.sub(
            rf"\.{name}(\.0)?\.kernel$",
            f".processor.{name}_lora.{direction}.weight", k,
        )
        return k
    k = re.sub(r"\.scale$", ".weight", k)
    k = re.sub(r"\.kernel$", ".weight", k)
    return k


def synth_torch_sd(flax_tree, oracle):
    sd = {}
    for path, shape in tree_paths(flax_tree).items():
        key = oracle(path)
        if path.endswith("kernel"):
            if len(shape) == 4:
                arr = np.random.rand(shape[3], shape[2], shape[0], shape[1])
            else:
                arr = np.random.rand(shape[1], shape[0])
        elif path.endswith("scale") or path.endswith("bias"):
            arr = np.random.rand(*shape)
        elif path == "position_embedding" or path.endswith("embedding"):
            arr = np.random.rand(*shape)
        else:
            arr = np.random.rand(*shape)
        sd[key] = arr.astype(np.float32)
    return sd


@pytest.fixture(scope="module")
def tiny_unet_params():
    import jax
    import jax.numpy as jnp

    from panfusion_tpu.nn.unet import UNet2DCondition

    net = UNet2DCondition(
        block_out_channels=(8, 16), layers_per_block=1, heads=(1, 1),
        dim_head=8, context_dim=16, lora_rank=2,
    )
    v = net.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 3, 16)),
    )
    return v["params"]


class TestUNetConversion:
    def test_full_tree_roundtrip(self, tiny_unet_params):
        sd = synth_torch_sd(tiny_unet_params, unet_flax_to_torch)
        got = cc.convert_unet(sd)
        want = tree_paths(tiny_unet_params)
        have = tree_paths(got)
        missing = set(want) - set(have)
        extra = set(have) - set(want)
        assert not missing, f"missing {sorted(missing)[:8]}"
        assert not extra, f"extra {sorted(extra)[:8]}"
        for k in want:
            assert want[k] == have[k], (k, want[k], have[k])

    def test_values_transposed_correctly(self, tiny_unet_params):
        sd = synth_torch_sd(tiny_unet_params, unet_flax_to_torch)
        got = cc.convert_unet(sd)
        # conv kernel: torch (O, I, kh, kw) -> flax (kh, kw, I, O)
        t = sd["conv_in.weight"]
        f = got["conv_in"]["kernel"]
        assert np.allclose(np.transpose(t, (2, 3, 1, 0)), f)
        # dense: torch (O, I) -> (I, O)
        t = sd["time_embedding.linear_1.weight"]
        f = got["time_embedding"]["linear_1"]["kernel"]
        assert np.allclose(t.T, f)

    def test_legacy_lora_spelling(self, tiny_unet_params):
        """to_q.lora_layer.down.weight must land where
        processor.to_q_lora.down.weight does (PanoGenerator.py:101-107)."""
        sd = synth_torch_sd(tiny_unet_params, unet_flax_to_torch)
        legacy = {}
        for k, v in sd.items():
            m = re.match(r"(.*)\.processor\.(to_q|to_k|to_v|to_out)_lora\.(down|up)\.weight", k)
            if m:
                name = m.group(2)
                tname = name if name != "to_out" else "to_out.0"
                legacy[f"{m.group(1)}.{tname}.lora_layer.{m.group(3)}.weight"] = v
            else:
                legacy[k] = v
        got = cc.convert_unet(legacy)
        want = tree_paths(tiny_unet_params)
        assert set(tree_paths(got)) == set(want)


class TestVAEConversion:
    def test_full_tree_roundtrip(self):
        import jax
        import jax.numpy as jnp

        from panfusion_tpu.nn.vae import AutoencoderKL

        net = AutoencoderKL(block_out_channels=(4, 8), layers_per_block=1)
        v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                     jax.random.PRNGKey(0))
        flax_tree = v["params"]

        def oracle(path):
            k = path
            m = re.match(r"(encoder|decoder)/down_(\d+)_res_(\d+)/(.*)", k)
            if m:
                k = f"{m.group(1)}.down_blocks.{m.group(2)}.resnets.{m.group(3)}.{m.group(4)}"
            m = re.match(r"(encoder|decoder)/down_(\d+)_downsample/conv/(.*)", k)
            if m:
                k = f"{m.group(1)}.down_blocks.{m.group(2)}.downsamplers.0.conv.{m.group(3)}"
            m = re.match(r"(encoder|decoder)/up_(\d+)_res_(\d+)/(.*)", k)
            if m:
                k = f"{m.group(1)}.up_blocks.{m.group(2)}.resnets.{m.group(3)}.{m.group(4)}"
            m = re.match(r"(encoder|decoder)/up_(\d+)_upsample/conv/(.*)", k)
            if m:
                k = f"{m.group(1)}.up_blocks.{m.group(2)}.upsamplers.0.conv.{m.group(3)}"
            m = re.match(r"(encoder|decoder)/mid_res_(\d+)/(.*)", k)
            if m:
                k = f"{m.group(1)}.mid_block.resnets.{m.group(2)}.{m.group(3)}"
            m = re.match(r"(encoder|decoder)/mid_attn/(.*)", k)
            if m:
                rest = m.group(2).replace("to_out", "to_out.0")
                k = f"{m.group(1)}.mid_block.attentions.0.{rest}"
            m = re.match(r"encoder/quant_conv/(.*)", k)
            if m:
                k = f"quant_conv.{m.group(1)}"
            m = re.match(r"decoder/post_quant_conv/(.*)", k)
            if m:
                k = f"post_quant_conv.{m.group(1)}"
            k = k.replace("/", ".")
            k = re.sub(r"\.scale$", ".weight", k)
            k = re.sub(r"\.kernel$", ".weight", k)
            return k

        sd = synth_torch_sd(flax_tree, oracle)
        got = cc.convert_vae(sd)
        want, have = tree_paths(flax_tree), tree_paths(got)
        assert set(want) == set(have), (
            sorted(set(want) - set(have))[:6],
            sorted(set(have) - set(want))[:6],
        )


class TestCLIPConversion:
    def test_text_tree(self):
        import jax
        import jax.numpy as jnp

        from panfusion_tpu.nn.clip import CLIPTextModel

        net = CLIPTextModel(
            vocab_size=64, hidden_size=8, intermediate_size=16,
            num_layers=2, num_heads=2, max_positions=16,
        )
        v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
        flax_tree = v["params"]

        def oracle(path):
            k = path
            if k == "token_embedding/embedding":
                return "text_model.embeddings.token_embedding.weight"
            if k == "position_embedding":
                return "text_model.embeddings.position_embedding.weight"
            m = re.match(r"layers_(\d+)/(.*)", k)
            if m:
                rest = m.group(2).replace("self_attn/", "self_attn.")
                if rest.startswith("fc1") or rest.startswith("fc2"):
                    rest = f"mlp.{rest}"
                rest = rest.replace("/", ".")
                rest = re.sub(r"\.scale$", ".weight", rest)
                rest = re.sub(r"\.kernel$", ".weight", rest)
                return f"text_model.encoder.layers.{m.group(1)}.{rest}"
            k = k.replace("/", ".")
            k = re.sub(r"\.scale$", ".weight", k)
            return f"text_model.{k}"

        sd = synth_torch_sd(flax_tree, oracle)
        params, proj = cc.convert_clip_text(sd)
        want, have = tree_paths(flax_tree), tree_paths(params)
        assert set(want) == set(have), (
            sorted(set(want) - set(have))[:6],
            sorted(set(have) - set(want))[:6],
        )


class TestResnetConversion:
    def test_resnet50_paths(self):
        """Synthesize torchvision resnet50 keys and check full coverage of
        the flax feature extractor tree."""
        import jax
        import jax.numpy as jnp

        from panfusion_tpu.nn.resnet import ResNet50Features

        net = ResNet50Features()
        v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3)), False)

        sd = {}
        sd["conv1.weight"] = np.random.rand(64, 3, 7, 7).astype(np.float32)
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            sd[f"bn1.{leaf}"] = np.random.rand(64).astype(np.float32)
        sizes, widths, inp = (3, 4, 6, 3), (64, 128, 256, 512), 64
        for li, (n, wch) in enumerate(zip(sizes, widths), start=1):
            for j in range(n):
                pt = f"layer{li}.{j}"
                cin = inp if j == 0 else wch * 4
                sd[f"{pt}.conv1.weight"] = np.random.rand(wch, cin, 1, 1).astype(np.float32)
                sd[f"{pt}.conv2.weight"] = np.random.rand(wch, wch, 3, 3).astype(np.float32)
                sd[f"{pt}.conv3.weight"] = np.random.rand(wch * 4, wch, 1, 1).astype(np.float32)
                for b, c in ((1, wch), (2, wch), (3, wch * 4)):
                    for leaf in ("weight", "bias", "running_mean", "running_var"):
                        sd[f"{pt}.bn{b}.{leaf}"] = np.random.rand(c).astype(np.float32)
                if j == 0:
                    sd[f"{pt}.downsample.0.weight"] = np.random.rand(
                        wch * 4, cin, 1, 1
                    ).astype(np.float32)
                    for leaf in ("weight", "bias", "running_mean", "running_var"):
                        sd[f"{pt}.downsample.1.{leaf}"] = np.random.rand(
                            wch * 4
                        ).astype(np.float32)
            inp = wch * 4
        got = cc.convert_resnet50(sd)
        want_p = tree_paths(v["params"])
        have_p = tree_paths(got["params"])
        assert set(want_p) == set(have_p), (
            sorted(set(want_p) - set(have_p))[:6],
            sorted(set(have_p) - set(want_p))[:6],
        )
        want_s = tree_paths(v["batch_stats"])
        have_s = tree_paths(got["batch_stats"])
        assert set(want_s) == set(have_s)


class TestHorizonNetConverter:
    def test_full_reference_sd_roundtrip(self):
        """Synthesize the REFERENCE-shaped HorizonNet state dict — torchvision
        resnet50 keys under feature_extractor.encoder, GlobalHeightStage and
        biLSTM keys, with the wrap_lr_pad conv rename applied to every conv
        (model.py:34-47 wraps each Conv2d as Sequential(pad, conv)) — and
        pin that conversion reproduces HorizonNetCore's tree exactly."""
        import jax
        import jax.numpy as jnp

        from panfusion_tpu.models.horizonnet import HorizonNetCore

        net = HorizonNetCore()
        v = jax.jit(net.init, static_argnums=2)(
            jax.random.PRNGKey(0), jnp.zeros((1, 512, 1024, 3)), False
        )
        want_p = tree_paths(v["params"])
        want_s = tree_paths(v["batch_stats"])

        rng = np.random.default_rng(0)
        sd = {}

        def wrap(key):
            """wrap_lr_pad rename: conv '<p>.weight' -> '<p>.1.weight'."""
            for leaf in (".weight", ".bias"):
                if key.endswith(leaf):
                    return key[: -len(leaf)] + ".1" + leaf
            return key

        # -- resnet50 under feature_extractor.encoder (convs wrapped)
        pre = "feature_extractor.encoder."
        sd[wrap(pre + "conv1.weight")] = rng.random((64, 3, 7, 7), np.float32)
        for leaf in ("weight", "bias", "running_mean", "running_var"):
            sd[f"{pre}bn1.{leaf}"] = rng.random(64, np.float32)
        sizes, widths, inp = (3, 4, 6, 3), (64, 128, 256, 512), 64
        for li, (n, wch) in enumerate(zip(sizes, widths), start=1):
            for j in range(n):
                pt = f"{pre}layer{li}.{j}"
                cin = inp if j == 0 else wch * 4
                sd[wrap(f"{pt}.conv1.weight")] = rng.random((wch, cin, 1, 1), np.float32)
                sd[wrap(f"{pt}.conv2.weight")] = rng.random((wch, wch, 3, 3), np.float32)
                sd[wrap(f"{pt}.conv3.weight")] = rng.random((wch * 4, wch, 1, 1), np.float32)
                for b, c in ((1, wch), (2, wch), (3, wch * 4)):
                    for leaf in ("weight", "bias", "running_mean", "running_var"):
                        sd[f"{pt}.bn{b}.{leaf}"] = rng.random(c, np.float32)
                if j == 0:
                    sd[wrap(f"{pt}.downsample.0.weight")] = rng.random(
                        (wch * 4, cin, 1, 1), np.float32)
                    for leaf in ("weight", "bias", "running_mean", "running_var"):
                        sd[f"{pt}.downsample.1.{leaf}"] = rng.random(
                            wch * 4, np.float32)
            inp = wch * 4

        # -- GlobalHeightStage (shapes from the flax tree, transposed back)
        for i in range(4):
            for j in range(4):
                pf = f"ghc_{i}/c{j}"
                kh, kw, cin, cout = want_p[f"{pf}/conv/kernel"]
                pt = f"reduce_height_module.ghc_lst.{i}.layer.{j}.layers"
                sd[wrap(f"{pt}.0.weight")] = rng.random(
                    (cout, cin, kh, kw), np.float32)
                sd[wrap(f"{pt}.0.bias")] = rng.random(cout, np.float32)
                for tl, fl in (("weight", "scale"), ("bias", "bias")):
                    sd[f"{pt}.1.{tl}"] = rng.random(cout, np.float32)
                sd[f"{pt}.1.running_mean"] = rng.random(cout, np.float32)
                sd[f"{pt}.1.running_var"] = rng.random(cout, np.float32)

        # -- biLSTM + linear
        for layer in (0, 1):
            for direction, name in (("", "fwd_cell"), ("_reverse", "bwd_cell")):
                cin, H = want_p[f"rnn{layer}/{name}/ii/kernel"]
                sd[f"bi_rnn.weight_ih_l{layer}{direction}"] = rng.random(
                    (4 * H, cin), np.float32)
                sd[f"bi_rnn.weight_hh_l{layer}{direction}"] = rng.random(
                    (4 * H, H), np.float32)
                sd[f"bi_rnn.bias_ih_l{layer}{direction}"] = rng.random(
                    4 * H, np.float32)
                sd[f"bi_rnn.bias_hh_l{layer}{direction}"] = rng.random(
                    4 * H, np.float32)
        cin, cout = want_p["linear/kernel"]
        sd["linear.weight"] = rng.random((cout, cin), np.float32)
        sd["linear.bias"] = rng.random(cout, np.float32)

        got = cc.convert_horizonnet(sd)
        have_p = tree_paths(got["params"])
        have_s = tree_paths(got["batch_stats"])
        assert set(have_p) == set(want_p), (
            sorted(set(want_p) - set(have_p))[:8],
            sorted(set(have_p) - set(want_p))[:8],
        )
        for k in want_p:
            assert want_p[k] == have_p[k], (k, want_p[k], have_p[k])
        assert set(have_s) == set(want_s)
        # LSTM biases live on the recurrent denses (flax OptimizedLSTMCell)
        assert "rnn0/fwd_cell/hi/bias" in have_p
        assert "rnn0/fwd_cell/ii/bias" not in have_p


class TestPanFusionConverterTree:
    def test_output_wrapped_like_live_params(self):
        """convert_panfusion_ckpt must return {dual: {params: ...}} so
        warm_start_params path-matching hits (a bare {params: ...} merges
        zero tensors)."""
        sd = {
            "mv_base_model.cp_blocks_mid.transformer.norm1.weight":
                np.zeros(8, np.float32),
            "eval_metrics.fid.something": np.zeros(1, np.float32),
        }
        out = cc.convert_panfusion_ckpt(sd)
        assert set(out) == {"dual"}
        assert set(out["dual"]) == {"params"}
        flat = tree_paths(out["dual"]["params"])
        assert any(k.startswith("cp_blocks_mid/") for k in flat)
        assert not any("eval_metrics" in k for k in flat)
