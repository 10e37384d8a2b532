"""Composite full-step oracles for the TPT-prompt and CoCoOp families.

Mirrors tests/test_composite_oracle.py (the DeYO/LoRA family) for the other
two adaptation families. TPT (`lora_encoder='prompt'`, reference
ttl.py:86-110 + custom_clip_old.py): a torch reimplementation of the whole
episodic step -

    frozen vision features over all views -> CoOp ctx assembled into prompt
    embeddings -> causal text tower with EOT pooling -> top-10%
    lowest-entropy view selection FROZEN after step 1 (ttl.py:97-100) ->
    avg_entropy loss (logsumexp + fp-min clamp, ttl.py:56-61) -> torch AdamW
    on ctx only -> adapted clean-view logits

- vs make_tpt_adapt_fn on identical weights, at 1 and 2 update steps.

CoCoOp (--cocoop, reference cocoop.py + ttl.py:71-74): meta-net conditioned
ctx -> pgen_ctx optimization -> the reference's discard-adapted-ctx final
inference, vs make_cocoop_adapt_fn. With these, every adaptation family is
pinned end-to-end against a torch composite, not just factor-wise.
"""
import math

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from test_composite_oracle import TorchTinyVit, t
from ttl_tpu.adapt.ttl import make_tpt_adapt_fn
from ttl_tpu.config import TTLConfig
from ttl_tpu.models.clip import init_clip_params
from ttl_tpu.models.prompts import init_prompt_learner
from ttl_tpu.models.zoo import TEST_TINY

pytestmark = pytest.mark.slow  # full-step torch oracles

V = 16
CLASSNAMES = ["forest", "river", "highway", "lake", "farmland"]


class TorchTinyText(torch.nn.Module):
    """Causal text tower taking prompt EMBEDDINGS (the TPT path feeds
    assembled ctx prompts, not token ids; EOT pooling still uses the ids)."""

    def __init__(self, tp):
        super().__init__()
        tc = TEST_TINY.text
        self.heads, self.eps = tc.heads, tc.ln_eps
        self.pos_embed = t(tp["pos_embed"])
        self.proj = t(tp["proj"])
        self.ln_final = (t(tp["ln_final"]["scale"]), t(tp["ln_final"]["bias"]))
        self.layers = []
        for i in range(tc.layers):
            lp = jax.tree.map(lambda a: a[i], tp["layers"])
            layer = {k: t(v["w"]) for k, v in lp["attn"].items()}
            layer.update({f"{k}_b": t(v["b"]) for k, v in lp["attn"].items()})
            layer["fc1"], layer["fc1_b"] = (t(lp["mlp"]["fc1"]["w"]),
                                            t(lp["mlp"]["fc1"]["b"]))
            layer["fc2"], layer["fc2_b"] = (t(lp["mlp"]["fc2"]["w"]),
                                            t(lp["mlp"]["fc2"]["b"]))
            layer["ln1"] = (t(lp["ln1"]["scale"]), t(lp["ln1"]["bias"]))
            layer["ln2"] = (t(lp["ln2"]["scale"]), t(lp["ln2"]["bias"]))
            self.layers.append(layer)

    def forward(self, emb, tokens):
        # slice pos_embed to the (EOT-truncated) prompt length, mirroring
        # text_features_from_embeddings - the truncation itself is pinned
        # exact by tests/test_ctx_truncation.py
        x = emb + self.pos_embed[: emb.shape[1]]
        s = x.shape[1]
        causal = torch.triu(torch.full((s, s), float("-inf")), diagonal=1)
        for lp in self.layers:
            h = TorchTinyVit._ln(x, lp["ln1"], self.eps)
            q, k, v = (h @ lp[n] + lp[f"{n}_b"] for n in ("q", "k", "v"))
            bsz, sl, d = q.shape
            hd = d // self.heads

            def split(z):
                return z.reshape(bsz, sl, self.heads, hd).permute(0, 2, 1, 3)

            att = torch.softmax(
                split(q) @ split(k).transpose(-1, -2) / math.sqrt(hd)
                + causal, -1)
            a = (att @ split(v)).permute(0, 2, 1, 3).reshape(bsz, sl, d)
            x = x + a @ lp["o"] + lp["o_b"]
            h2 = TorchTinyVit._ln(x, lp["ln2"], self.eps)
            m = h2 @ lp["fc1"] + lp["fc1_b"]
            x = x + (m * torch.sigmoid(1.702 * m)) @ lp["fc2"] + lp["fc2_b"]
        x = TorchTinyVit._ln(x, self.ln_final, self.eps)
        pooled = x[torch.arange(x.shape[0]), tokens.argmax(dim=-1)]
        return pooled @ self.proj


def torch_tpt_step(params, pl_state, views, cfg):
    d = TEST_TINY.vision.hidden
    zero = {n: {"A": np.zeros((2, d, 4), np.float32),
                "B": np.zeros((2, 4, d), np.float32)} for n in ("q", "v")}
    vit = TorchTinyVit(params["vision"], zero, cfg)  # LoRA contribution = 0
    txt = TorchTinyText(params["text"])
    tokens = torch.from_numpy(np.asarray(pl_state.tokenized).copy())
    prefix = t(pl_state.prefix)
    suffix = t(pl_state.suffix)
    ls = float(np.exp(np.asarray(params["logit_scale"], np.float32)))

    with torch.no_grad():
        vf = vit(torch.from_numpy(views))
        vf = vf / vf.norm(dim=-1, keepdim=True)

    ctx = torch.nn.Parameter(t(pl_state.ctx_init))
    opt = torch.optim.AdamW([ctx], lr=cfg.lr, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=1e-2)

    def logits_for():
        emb = torch.cat(
            [prefix, ctx.expand(prefix.shape[0], -1, -1), suffix], dim=1)
        tf = txt(emb, tokens)
        tf = tf / tf.norm(dim=-1, keepdim=True)
        return ls * vf @ tf.T

    with torch.no_grad():
        zs = logits_for()[0]

    k_sel = max(int(cfg.batch_size * cfg.selection_p), 1)
    sel_idx = None
    for step in range(cfg.tta_steps):
        logits = logits_for()
        if step == 0:  # selection frozen after the first step (ttl.py:97-100)
            with torch.no_grad():
                logp = logits.log_softmax(-1)
                ent = -(logp.exp() * logp).sum(-1)
                sel_idx = torch.argsort(ent)[:k_sel]
        sel = logits[sel_idx]
        # avg_entropy: logsumexp form with fp-min clamp (ttl.py:56-61)
        logp = sel.log_softmax(-1)
        avg_logp = torch.logsumexp(logp, dim=0) - math.log(sel.shape[0])
        avg_logp = avg_logp.clamp(min=torch.finfo(torch.float32).min)
        loss = -(avg_logp * avg_logp.exp()).sum()
        opt.zero_grad()
        loss.backward()
        opt.step()

    with torch.no_grad():
        adapted = logits_for()[0]
    return np.asarray(zs), np.asarray(adapted)


@pytest.fixture(scope="module")
def setup():
    params = init_clip_params(jax.random.PRNGKey(0), TEST_TINY)
    pl_state = init_prompt_learner(
        params["text"]["token_embed"].astype(jnp.float32), CLASSNAMES)
    views = np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (V, 3, 64, 64)),
        np.float32) * 0.6
    return params, pl_state, views


def torch_cocoop_step(params, co_state, views, cfg):
    """The whole CoCoOp episodic step in torch (reference cocoop.py:118-182
    + ttl.py:71-74,92-108,350-352): meta-net conditioned ctx -> pgen_ctx
    optimization with TPT selection -> UNadapted conditioned final inference
    (the reference discards the adapted pgen_ctx) + the adapted logits."""
    d = TEST_TINY.vision.hidden
    zero = {n: {"A": np.zeros((2, d, 4), np.float32),
                "B": np.zeros((2, 4, d), np.float32)} for n in ("q", "v")}
    vit = TorchTinyVit(params["vision"], zero, cfg)
    txt = TorchTinyText(params["text"])
    tokens = torch.from_numpy(np.asarray(co_state.tokenized).copy())
    prefix, suffix = t(co_state.prefix), t(co_state.suffix)
    base_ctx = t(co_state.ctx)
    w1, b1 = t(co_state.meta_w1), t(co_state.meta_b1)
    w2, b2 = t(co_state.meta_w2), t(co_state.meta_b2)
    ls = float(np.exp(np.asarray(params["logit_scale"], np.float32)))

    def meta_shift(feat):  # [B, proj] -> [B, n_ctx, d]
        bias = torch.relu(feat @ w1 + b1) @ w2 + b2
        return base_ctx[None] + bias[:, None, :]

    with torch.no_grad():
        vf = vit(torch.from_numpy(views))
        vf = vf / vf.norm(dim=-1, keepdim=True)
        pgen0 = meta_shift(vf.mean(0, keepdim=True))[0]

    def text_for(ctx_row):
        emb = torch.cat(
            [prefix, ctx_row.expand(prefix.shape[0], -1, -1), suffix], dim=1)
        tf = txt(emb, tokens)
        return tf / tf.norm(dim=-1, keepdim=True)

    ctx_row = torch.nn.Parameter(pgen0.clone())
    opt = torch.optim.AdamW([ctx_row], lr=cfg.lr, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=1e-2)
    k_sel = max(int(cfg.batch_size * cfg.selection_p), 1)
    sel_idx = None
    for step in range(cfg.tta_steps):
        logits = ls * vf @ text_for(ctx_row).T
        if step == 0:
            with torch.no_grad():
                logp = logits.log_softmax(-1)
                ent = -(logp.exp() * logp).sum(-1)
                sel_idx = torch.argsort(ent)[:k_sel]
        logp = logits[sel_idx].log_softmax(-1)
        avg_logp = torch.logsumexp(logp, dim=0) - math.log(len(sel_idx))
        loss = -(avg_logp.clamp(min=torch.finfo(torch.float32).min)
                 * avg_logp.exp()).sum()
        opt.zero_grad()
        loss.backward()
        opt.step()

    with torch.no_grad():
        clean_ctx = meta_shift(vf[:1])[0]
        ref_logits = (ls * vf[:1] @ text_for(clean_ctx).T)[0]
        adapted = (ls * vf[:1] @ text_for(ctx_row).T)[0]
    return np.asarray(ref_logits), np.asarray(adapted)


@pytest.mark.parametrize("tta_steps", [1, 2])
def test_cocoop_composite_matches_torch(setup, tta_steps):
    from ttl_tpu.adapt.cocoop import init_cocoop, make_cocoop_adapt_fn
    params, _, views = setup
    cfg = TTLConfig(arch="test-tiny", resolution=64, batch_size=V,
                    cocoop=True, tta_steps=tta_steps,
                    compute_dtype="float32", param_dtype="float32")
    co_state = init_cocoop(params["text"]["token_embed"].astype(jnp.float32),
                           CLASSNAMES, TEST_TINY.vision.proj_dim,
                           jax.random.PRNGKey(1))
    res = make_cocoop_adapt_fn(TEST_TINY, cfg)(
        params, co_state, jnp.asarray(views), jax.random.PRNGKey(7))
    ref_t, adapted_t = torch_cocoop_step(params, co_state, views, cfg)

    np.testing.assert_allclose(np.asarray(res.logits), ref_t,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(res.adapted_logits), adapted_t,
                               rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("tta_steps", [1, 2])
def test_tpt_composite_matches_torch(setup, tta_steps):
    params, pl_state, views = setup
    cfg = TTLConfig(arch="test-tiny", resolution=64, batch_size=V,
                    lora_encoder="prompt", tta_steps=tta_steps,
                    compute_dtype="float32", param_dtype="float32")
    res, ctx = make_tpt_adapt_fn(TEST_TINY, cfg)(
        params, pl_state, jnp.asarray(views), jax.random.PRNGKey(7))
    torch_zs, torch_adapted = torch_tpt_step(params, pl_state, views, cfg)

    np.testing.assert_allclose(np.asarray(res.zero_shot_logits), torch_zs,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(res.logits), torch_adapted,
                               rtol=5e-4, atol=5e-4)
    assert np.abs(torch_adapted - torch_zs).max() > 1e-4  # non-vacuous