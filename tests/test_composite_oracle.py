"""Composite full-step oracle: one torch reimplementation of the WHOLE
reference episodic TTL step vs `adapt_one`.

Every factor of the step is oracle-tested elsewhere (towers vs HF in
test_clip_parity, DeYO gradients vs torch autograd in test_entropy, AdamW vs
torch in test_adapt); this test pins the *composition* - prefix caching,
stop_gradient placement, update ordering, episodic reset - by running the
reference semantics end-to-end in torch on identical weights:

    tiny CLIP ViT + PEFT-shaped LoRA on q/v of ALL layers (B=0; only the
    layer_range window's A/B are optimized, exactly custom_clip.py:583-616 +
    ttl.py:151-166) -> DeYO reweighted-entropy loss over all views
    (deyo.py:92-196, unscaled margins) -> torch AdamW step(s) (ttl.py:189-218)
    -> adapted clean-view logits (ttl.py:350-352)

and asserting the JAX program's adapted logits match within fp tolerance.
"""
import math

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ttl_tpu.adapt.ttl import make_batched_ttl_fn
from ttl_tpu.config import TTLConfig, effective_update_steps
from ttl_tpu.models.clip import init_clip_params
from ttl_tpu.models.zoo import TEST_TINY
from ttl_tpu.ops.lora import init_adapters, lora_scale

pytestmark = pytest.mark.slow  # full-step torch oracles

torch.set_grad_enabled(True)

V = 16          # views per sample
N_CLS = 5
WINDOW = (2, 3)  # adapted layer range (inclusive) of the 4-layer tiny tower
RANK = 4


def t(x):
    return torch.from_numpy(np.asarray(x, np.float32).copy())


class TorchTinyVit(torch.nn.Module):
    """Reference-shaped vision tower: LoRA on q/v of every layer (PEFT
    applies adapters to all 12 layers, custom_clip.py:596; B=0 makes
    non-window layers mathematically frozen)."""

    def __init__(self, vp, adapters0, cfg, window=WINDOW):
        super().__init__()
        vc = TEST_TINY.vision
        self.grid, self.patch, self.heads = vc.grid, vc.patch, vc.heads
        self.eps = vc.ln_eps
        self.scale = lora_scale(cfg.rank, cfg.lora_alpha)
        self.window = window
        self.patch_embed = t(vp["patch_embed"])
        self.class_embed = t(vp["class_embed"])
        self.pos_embed = t(vp["pos_embed"])
        self.proj = t(vp["proj"])
        self.ln_pre = (t(vp["ln_pre"]["scale"]), t(vp["ln_pre"]["bias"]))
        self.ln_post = (t(vp["ln_post"]["scale"]), t(vp["ln_post"]["bias"]))
        self.layers = []
        L = vc.layers
        lo, hi = window
        for i in range(L):
            lp = jax.tree.map(lambda a: a[i], vp["layers"])
            layer = {k: t(v["w"]) for k, v in lp["attn"].items()}
            layer.update({f"{k}_b": t(v["b"]) for k, v in lp["attn"].items()})
            layer["fc1"], layer["fc1_b"] = t(lp["mlp"]["fc1"]["w"]), t(lp["mlp"]["fc1"]["b"])
            layer["fc2"], layer["fc2_b"] = t(lp["mlp"]["fc2"]["w"]), t(lp["mlp"]["fc2"]["b"])
            layer["ln1"] = (t(lp["ln1"]["scale"]), t(lp["ln1"]["bias"]))
            layer["ln2"] = (t(lp["ln2"]["scale"]), t(lp["ln2"]["bias"]))
            # LoRA A/B: window layers get the episodic init; others are
            # fresh-drawn A with B=0 (PEFT default) - contribution is zero
            # and never trained, like the reference's non-window layers
            if lo <= i <= hi:
                j = i - lo
                layer["Aq"] = torch.nn.Parameter(t(adapters0["q"]["A"][j]))
                layer["Bq"] = torch.nn.Parameter(t(adapters0["q"]["B"][j]))
                layer["Av"] = torch.nn.Parameter(t(adapters0["v"]["A"][j]))
                layer["Bv"] = torch.nn.Parameter(t(adapters0["v"]["B"][j]))
            else:
                g = torch.Generator().manual_seed(i)
                d = vc.hidden
                layer["Aq"] = torch.randn((d, RANK), generator=g) * 0.02
                layer["Bq"] = torch.zeros((RANK, d))
                layer["Av"] = torch.randn((d, RANK), generator=g) * 0.02
                layer["Bv"] = torch.zeros((RANK, d))
            self.layers.append(layer)

    def lora_params(self):
        lo, hi = self.window
        out = []
        for i in range(lo, hi + 1):
            lp = self.layers[i]
            out += [lp["Aq"], lp["Bq"], lp["Av"], lp["Bv"]]
        return out

    @staticmethod
    def _ln(x, p, eps):
        mu = x.mean(-1, keepdim=True)
        var = x.var(-1, keepdim=True, unbiased=False)
        return (x - mu) / torch.sqrt(var + eps) * p[0] + p[1]

    def forward(self, images):
        b = images.shape[0]
        g, p = self.grid, self.patch
        x = images.reshape(b, 3, g, p, g, p).permute(0, 2, 4, 1, 3, 5)
        x = x.reshape(b, g * g, 3 * p * p) @ self.patch_embed
        cls = self.class_embed.expand(b, 1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        x = self._ln(x, self.ln_pre, self.eps)
        for lp in self.layers:
            h = self._ln(x, lp["ln1"], self.eps)
            q = h @ lp["q"] + lp["q_b"] + self.scale * (h @ lp["Aq"]) @ lp["Bq"]
            k = h @ lp["k"] + lp["k_b"]
            v = h @ lp["v"] + lp["v_b"] + self.scale * (h @ lp["Av"]) @ lp["Bv"]
            bsz, s, d = q.shape
            hd = d // self.heads

            def split(z):
                return z.reshape(bsz, s, self.heads, hd).permute(0, 2, 1, 3)

            qh, kh, vh = split(q), split(k), split(v)
            att = torch.softmax(qh @ kh.transpose(-1, -2) / math.sqrt(hd), -1)
            a = (att @ vh).permute(0, 2, 1, 3).reshape(bsz, s, d)
            x = x + a @ lp["o"] + lp["o_b"]
            h2 = self._ln(x, lp["ln2"], self.eps)
            m = h2 @ lp["fc1"] + lp["fc1_b"]
            m = m * torch.sigmoid(1.702 * m)
            x = x + m @ lp["fc2"] + lp["fc2_b"]
        pooled = self._ln(x[:, 0], self.ln_post, self.eps)
        return pooled @ self.proj


def torch_episodic_step(vit, text_cls, logit_scale, views, cfg):
    """The reference's whole per-sample step: DeYO loss over all views ->
    AdamW step(s) on window LoRA -> adapted clean-view logits."""
    tc = t(text_cls)
    ls = float(np.exp(np.asarray(logit_scale, np.float32)))
    opt = torch.optim.AdamW(vit.lora_params(), lr=cfg.lr, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=1e-2)

    def logits_for(x):
        f = vit(x)
        f = f / f.norm(dim=-1, keepdim=True)
        return ls * f @ tc.T

    with torch.no_grad():
        zs = logits_for(views[:1])[0]

    for _ in range(effective_update_steps(cfg)):
        logits = logits_for(views)
        logp = torch.log_softmax(logits, dim=-1)
        ent = -(logp.exp() * logp).sum(-1)
        keep = ent <= math.log(1000.0)                      # deyo.py:107
        coeff = 1.0 / torch.exp(ent.detach() - cfg.deyo_margin_e0)
        loss = (ent * coeff * keep).sum() / keep.sum()      # deyo.py:179-181
        opt.zero_grad()
        loss.backward()
        opt.step()

    with torch.no_grad():
        adapted = logits_for(views[:1])[0]
    return np.asarray(zs), np.asarray(adapted)


@pytest.fixture(scope="module")
def setup():
    params = init_clip_params(jax.random.PRNGKey(0), TEST_TINY)
    adapters0 = init_adapters(jax.random.PRNGKey(1), 2,
                              TEST_TINY.vision.hidden, RANK, "xavier")
    text_cls = np.asarray(jax.random.normal(jax.random.PRNGKey(2),
                                            (N_CLS, TEST_TINY.vision.proj_dim)))
    text_cls = text_cls / np.linalg.norm(text_cls, axis=-1, keepdims=True)
    views = np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (V, 3, 64, 64)),
        np.float32) * 0.6
    return params, adapters0, text_cls, views


def test_composite_with_frozen_suffix_matches_torch(setup):
    """Window (1,2) of the 4-layer tower: layer 3 is a frozen SUFFIX layer
    that gradients traverse under remat (models/clip._run_layers remat=True
    - the ViT-L memory path). The torch oracle backprops through it
    normally; results must match exactly."""
    params, _, text_cls, views = setup
    window = (1, 2)
    adapters0 = init_adapters(jax.random.PRNGKey(1), 2,
                              TEST_TINY.vision.hidden, RANK, "xavier")
    cfg = TTLConfig(arch="test-tiny", resolution=64, batch_size=V,
                    layer_range=window, rank=RANK, tta_steps=1,
                    compute_dtype="float32", param_dtype="float32")
    fn = make_batched_ttl_fn(TEST_TINY, cfg, zero_shot_aux=True)
    res = fn(params, jnp.asarray(text_cls, jnp.float32), adapters0,
             jnp.asarray(views)[None],
             jax.random.split(jax.random.PRNGKey(9), 1))

    vit = TorchTinyVit(params["vision"], adapters0, cfg, window=window)
    torch_zs, torch_adapted = torch_episodic_step(
        vit, text_cls, params["logit_scale"], torch.from_numpy(views), cfg)
    np.testing.assert_allclose(np.asarray(res.zero_shot_logits[0]), torch_zs,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(res.logits[0]), torch_adapted,
                               rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("tta_steps", [1, 2])
def test_composite_episodic_step_matches_torch(setup, tta_steps):
    params, adapters0, text_cls, views = setup
    cfg = TTLConfig(arch="test-tiny", resolution=64, batch_size=V,
                    layer_range=WINDOW, rank=RANK, tta_steps=tta_steps,
                    compute_dtype="float32", param_dtype="float32")
    assert effective_update_steps(cfg) == tta_steps ** 2  # ttl.py:78-81 quirk

    fn = make_batched_ttl_fn(TEST_TINY, cfg, zero_shot_aux=True)
    res = fn(params, jnp.asarray(text_cls, jnp.float32), adapters0,
             jnp.asarray(views)[None], jax.random.split(jax.random.PRNGKey(9), 1))
    jax_zs = np.asarray(res.zero_shot_logits[0])
    jax_adapted = np.asarray(res.logits[0])

    vit = TorchTinyVit(params["vision"], adapters0, cfg)
    torch_zs, torch_adapted = torch_episodic_step(
        vit, text_cls, params["logit_scale"], torch.from_numpy(views), cfg)

    # pre-adaptation forward parity (sanity: identical weights/views)
    np.testing.assert_allclose(jax_zs, torch_zs, rtol=2e-4, atol=2e-4)
    # the composite claim: adapted logits match after the full episodic step
    np.testing.assert_allclose(jax_adapted, torch_adapted,
                               rtol=5e-4, atol=5e-4)
    # and the adaptation actually moved the logits (the test isn't vacuous)
    delta_t = torch_adapted - torch_zs
    delta_j = jax_adapted - jax_zs
    assert np.abs(delta_t).max() > 1e-4
    np.testing.assert_allclose(delta_j, delta_t, rtol=0.05,
                               atol=np.abs(delta_t).max() * 0.05)


class TorchTinyText(torch.nn.Module):
    """Reference-shaped text tower for the text-LoRA mode
    (--lora_encoder text): causal attention, LoRA on q/v of the window
    layers only (the JAX text path attaches no adapters elsewhere), EOT
    pooling by token-id argmax, text projection - mirrors
    models/clip.text_features."""

    def __init__(self, tp, adapters0, cfg, window=WINDOW):
        super().__init__()
        tc = TEST_TINY.text
        self.heads, self.eps = tc.heads, tc.ln_eps
        self.scale = lora_scale(cfg.rank, cfg.lora_alpha)
        self.window = window
        self.token_embed = t(tp["token_embed"])
        self.pos_embed = t(tp["pos_embed"])
        self.ln_final = (t(tp["ln_final"]["scale"]), t(tp["ln_final"]["bias"]))
        self.proj = t(tp["proj"])
        self.layers = []
        lo, hi = window
        for i in range(tc.layers):
            lp = jax.tree.map(lambda a: a[i], tp["layers"])
            layer = {k: t(v["w"]) for k, v in lp["attn"].items()}
            layer.update({f"{k}_b": t(v["b"]) for k, v in lp["attn"].items()})
            layer["fc1"], layer["fc1_b"] = t(lp["mlp"]["fc1"]["w"]), t(lp["mlp"]["fc1"]["b"])
            layer["fc2"], layer["fc2_b"] = t(lp["mlp"]["fc2"]["w"]), t(lp["mlp"]["fc2"]["b"])
            layer["ln1"] = (t(lp["ln1"]["scale"]), t(lp["ln1"]["bias"]))
            layer["ln2"] = (t(lp["ln2"]["scale"]), t(lp["ln2"]["bias"]))
            if lo <= i <= hi:
                j = i - lo
                layer["Aq"] = torch.nn.Parameter(t(adapters0["q"]["A"][j]))
                layer["Bq"] = torch.nn.Parameter(t(adapters0["q"]["B"][j]))
                layer["Av"] = torch.nn.Parameter(t(adapters0["v"]["A"][j]))
                layer["Bv"] = torch.nn.Parameter(t(adapters0["v"]["B"][j]))
            self.layers.append(layer)

    def lora_params(self):
        lo, hi = self.window
        return [p for i in range(lo, hi + 1) for p in
                (self.layers[i]["Aq"], self.layers[i]["Bq"],
                 self.layers[i]["Av"], self.layers[i]["Bv"])]

    def forward(self, tokens):
        n, ctx = tokens.shape
        lo, hi = self.window
        x = self.token_embed[tokens] + self.pos_embed[:ctx]
        causal = torch.full((ctx, ctx), float("-inf")).triu(1)
        for i, lp in enumerate(self.layers):
            h = TorchTinyVit._ln(x, lp["ln1"], self.eps)
            q = h @ lp["q"] + lp["q_b"]
            v = h @ lp["v"] + lp["v_b"]
            if lo <= i <= hi:
                q = q + self.scale * (h @ lp["Aq"]) @ lp["Bq"]
                v = v + self.scale * (h @ lp["Av"]) @ lp["Bv"]
            k = h @ lp["k"] + lp["k_b"]
            bsz, s, d = q.shape
            hd = d // self.heads

            def split(z):
                return z.reshape(bsz, s, self.heads, hd).permute(0, 2, 1, 3)

            qh, kh, vh = split(q), split(k), split(v)
            att = torch.softmax(
                qh @ kh.transpose(-1, -2) / math.sqrt(hd) + causal, -1)
            a = (att @ vh).permute(0, 2, 1, 3).reshape(bsz, s, d)
            x = x + a @ lp["o"] + lp["o_b"]
            h2 = TorchTinyVit._ln(x, lp["ln2"], self.eps)
            m = h2 @ lp["fc1"] + lp["fc1_b"]
            m = m * torch.sigmoid(1.702 * m)
            x = x + m @ lp["fc2"] + lp["fc2_b"]
        x = TorchTinyVit._ln(x, self.ln_final, self.eps)
        pooled = x[torch.arange(n), tokens.argmax(-1)]
        return pooled @ self.proj


def torch_text_episodic_step(txt, img_feats, logit_scale, tokens, cfg):
    """The text-LoRA per-sample step: frozen image features, DeYO loss over
    all views' logits against the re-encoded (adapted) text table, AdamW on
    the text window LoRA, adapted clean-view logits (adapt/ttl.py text
    branch; the reference's lora_encoder='text' config)."""
    ls = float(np.exp(np.asarray(logit_scale, np.float32)))
    vf = t(img_feats)
    vf = vf / vf.norm(dim=-1, keepdim=True)
    opt = torch.optim.AdamW(txt.lora_params(), lr=cfg.lr, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=1e-2)

    def logits_for(v):
        f = txt(tokens)
        f = f / f.norm(dim=-1, keepdim=True)
        return ls * v @ f.T

    with torch.no_grad():
        zs = logits_for(vf[:1])[0]
    for _ in range(effective_update_steps(cfg)):
        logits = logits_for(vf)
        logp = torch.log_softmax(logits, dim=-1)
        ent = -(logp.exp() * logp).sum(-1)
        keep = ent <= math.log(1000.0)
        coeff = 1.0 / torch.exp(ent.detach() - cfg.deyo_margin_e0)
        loss = (ent * coeff * keep).sum() / keep.sum()
        opt.zero_grad()
        loss.backward()
        opt.step()
    with torch.no_grad():
        adapted = logits_for(vf[:1])[0]
    return np.asarray(zs), np.asarray(adapted)


@pytest.mark.parametrize("tta_steps", [1, 2])
def test_text_lora_composite_matches_torch(setup, tta_steps):
    """Full episodic step of the 4th adaptation family (text-encoder LoRA):
    the adapted text tower re-encodes the EOT-truncated token table every
    update step while image features stay frozen. Composite oracle in
    torch on identical weights."""
    from ttl_tpu.models.clip import encode_image
    from ttl_tpu.models.prompts import needed_ctx_len, prompt_tokens

    params, _, _, views = setup
    cfg = TTLConfig(arch="test-tiny", resolution=64, batch_size=V,
                    layer_range=WINDOW, rank=RANK, tta_steps=tta_steps,
                    lora_encoder="text", compute_dtype="float32",
                    param_dtype="float32")
    toks = np.asarray(prompt_tokens([f"class {i}" for i in range(N_CLS)]))
    adapters0 = init_adapters(jax.random.PRNGKey(5), 2,
                              TEST_TINY.text.hidden, RANK, "xavier")

    fn = make_batched_ttl_fn(TEST_TINY, cfg, tokens=jnp.asarray(toks),
                             zero_shot_aux=True)
    dummy_cls = jnp.zeros((N_CLS, TEST_TINY.text.proj_dim), jnp.float32)
    res = fn(params, dummy_cls, adapters0, jnp.asarray(views)[None],
             jax.random.split(jax.random.PRNGKey(9), 1))
    jax_zs = np.asarray(res.zero_shot_logits[0])
    jax_adapted = np.asarray(res.logits[0])

    # the torch side sees the SAME truncated table the JAX program builds
    toks_t = toks[:, : needed_ctx_len(jnp.asarray(toks))]
    img_feats = np.asarray(encode_image(params["vision"], jnp.asarray(views),
                                        TEST_TINY.vision,
                                        compute_dtype=jnp.float32))
    txt = TorchTinyText(params["text"], adapters0, cfg)
    torch_zs, torch_adapted = torch_text_episodic_step(
        txt, img_feats, params["logit_scale"],
        torch.from_numpy(toks_t.astype(np.int64)), cfg)

    np.testing.assert_allclose(jax_zs, torch_zs, rtol=2e-4, atol=2e-4)
    # the adapted table is re-encoded through the whole tower every update
    # step, so f32 rounding accumulates with the effective step count
    # (observed ~1e-3 at 4 steps)
    steps = effective_update_steps(cfg)
    np.testing.assert_allclose(jax_adapted, torch_adapted,
                               rtol=5e-4 * steps, atol=5e-4 * steps)
    assert np.abs(torch_adapted - torch_zs).max() > 1e-4
