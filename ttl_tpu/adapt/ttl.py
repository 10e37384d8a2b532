"""The TTL episodic adaptation step, compiled as one XLA program.

Reference control flow (ttl.py:300-363, 70-110; deyo.py:92-196) is a Python
loop that, per test sample: resets LoRA in-place, reloads optimizer state,
runs forward/backward over 64 views, steps AdamW, then re-infers the clean
view. Here the whole thing is a single jit'd `value_and_grad` program:

    fresh (adapter, opt_state) -> scan over update steps -> adapted inference

Episodic semantics come for free: the initial adapter pytree is an *input*,
so every invocation starts from the same state (ttl.py:338-344) without any
copy-back machinery. The program is then vmapped over a batch of test
samples - batched independent AdamW states - which is the throughput win the
reference's per-sample Python loop cannot express (SURVEY.md section 7.5).

Gradient surface: only the LoRA A/B tensors of the layer_range window are
differentiated (~0.59M params of ~150M; ttl.py:151-166). The frozen prefix
of the tower is wrapped in stop_gradient so backward walks 3 layers, not 12.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import TTLConfig, effective_update_steps
from ..models.clip import (CLIPConfig, encode_image, l2_normalize,
                           text_features, text_features_from_embeddings,
                           vision_features)
from ..ops.entropy import deyo_loss, select_confident, tpt_loss
from ..ops.lora import lora_scale

# torch.optim.AdamW defaults (the reference relies on them, ttl.py:218)
ADAMW_BETAS = (0.9, 0.999)
ADAMW_EPS = 1e-8
ADAMW_WEIGHT_DECAY = 1e-2


def make_optimizer(cfg: TTLConfig) -> optax.GradientTransformation:
    return optax.adamw(cfg.lr, b1=ADAMW_BETAS[0], b2=ADAMW_BETAS[1],
                       eps=ADAMW_EPS, weight_decay=ADAMW_WEIGHT_DECAY)


class AdaptResult(NamedTuple):
    logits: jax.Array        # [C] adapted clean-view logits
    losses: jax.Array        # [steps] adaptation losses
    zero_shot_logits: jax.Array  # [C] pre-adaptation clean-view logits (aux)
    adapters: dict           # final adapter pytree (observability/tests)


def _patch_shuffle(views: jax.Array, key: jax.Array, patch_len: int):
    """PLPD counterfactual: per-view random patch permutation
    (deyo.py:123-131, aug_type='patch'). [V,3,H,W] -> [V,3,H,W]."""
    v, c, h, w = views.shape
    hp = (h // patch_len) * patch_len
    x = jax.image.resize(views, (v, c, hp, hp), method="bilinear")
    p = hp // patch_len
    x = x.reshape(v, c, patch_len, p, patch_len, p)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(v, patch_len * patch_len, c, p, p)
    perm = jax.vmap(lambda k: jax.random.permutation(k, patch_len * patch_len))(
        jax.random.split(key, v))
    x = jnp.take_along_axis(x, perm[:, :, None, None, None], axis=1)
    x = x.reshape(v, patch_len, patch_len, c, p, p).transpose(0, 3, 1, 4, 2, 5)
    x = x.reshape(v, c, hp, hp)
    return jax.image.resize(x, (v, c, h, w), method="bilinear")


def _pixel_shuffle(views: jax.Array, key: jax.Array):
    """PLPD aug_type='pixel': one shared pixel permutation (deyo.py:132-135)."""
    v, c, h, w = views.shape
    perm = jax.random.permutation(key, h * w)
    return views.reshape(v, c, h * w)[:, :, perm].reshape(v, c, h, w)


def _occlude(views: jax.Array, cfg: TTLConfig):
    """PLPD aug_type='occ': mean-fill a window (deyo.py:118-122)."""
    mean = jnp.mean(views, axis=(2, 3), keepdims=True)
    v, c, h, w = views.shape
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    inside = ((rows >= cfg.row_start)
              & (rows < cfg.row_start + cfg.occlusion_size)
              & (cols >= cfg.column_start)
              & (cols < cfg.column_start + cfg.occlusion_size))
    return jnp.where(inside[None, None], mean, views)


def make_ttl_adapt_fn(clip_cfg: CLIPConfig, cfg: TTLConfig, *,
                      zero_shot_aux: bool = False):
    """Build the per-sample episodic adaptation function (DeYO / TPT-on-LoRA
    paths; dispatch mirrors test_time_tuning, ttl.py:70-110).

    Returns f(params, text_cls, adapters0, views, key) -> AdaptResult where
      params:    frozen CLIP pytree
      text_cls:  [C, D] L2-normalized text classifier (frozen for
                 lora_encoder='image'; recomputed inside for 'text')
      adapters0: initial LoRA pytree (the episodic reset state)
      views:     [V, 3, H, W] CLIP-normalized views, views[0] = clean view
      key:       PRNG key (only consumed by the PLPD counterfactual)

    zero_shot_aux=True additionally computes pre-adaptation clean-view
    logits (an extra single-view window forward); surfaces that report both
    figures (predict --topk output, serve, the demo) opt in, while the eval
    hot loop keeps `zero_shot_logits` as zeros - the runner never reads it
    and the pass is pure waste there (the reference has no such aux output
    at all; its zero-shot figure is a separate tta_steps=0 run).
    """
    from ..config import resolve_layer_range
    window = resolve_layer_range(cfg, clip_cfg)
    scale = lora_scale(cfg.rank, cfg.lora_alpha)
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    steps = effective_update_steps(cfg)
    opt = make_optimizer(cfg)
    use_deyo = cfg.deyo_selection and cfg.lora_encoder != "prompt"
    on_image = cfg.lora_encoder == "image"

    def encode_views(params, adapters, views, tokens=None, text_cls=None,
                     img_feats=None, hidden=None):
        """Return [V, C] logits for the current adapter state. Frozen
        per-sample state is cached by the caller and reused across TTA
        steps: `hidden` is the prefix activation (layers [0, window[0]),
        image mode), `img_feats` the full frozen image features (text
        mode)."""
        if on_image:
            from ..models.clip import vision_from_hidden, vision_prefix
            if hidden is None:
                hidden = jax.lax.stop_gradient(vision_prefix(
                    params["vision"], views, clip_cfg.vision,
                    upto=window[0], compute_dtype=cd))
            vf = vision_from_hidden(params["vision"], hidden,
                                    clip_cfg.vision, adapters=adapters,
                                    adapter_window=window, lora_scale=scale)
            txt = text_cls
        else:  # lora_encoder == 'text': image features frozen, text adapted
            if img_feats is None:
                img_feats = jax.lax.stop_gradient(
                    encode_image(params["vision"], views, clip_cfg.vision,
                                 compute_dtype=cd))
            vf = img_feats
            txt = l2_normalize(text_features(
                params["text"], tokens, clip_cfg.text, adapters=adapters,
                adapter_window=window, lora_scale=scale, compute_dtype=cd))
        img = l2_normalize(vf)
        return jnp.exp(params["logit_scale"]) * img @ txt.T

    def deyo_objective(logits, views, adapters, params, text_cls, tokens, key):
        # The PLPD counterfactual forward runs ONLY under filter_plpd, as in
        # the reference (deyo.py:115-151 is gated on args.filter_plpd;
        # reweight_plpd alone never triggers it because its coefficient term
        # is commented out upstream - deyo.py:175-177, see ops/entropy.py)
        plpd = None
        if cfg.filter_plpd:
            if cfg.aug_type == "patch":
                x_prime = _patch_shuffle(views, key, cfg.patch_len)
            elif cfg.aug_type == "pixel":
                x_prime = _pixel_shuffle(views, key)
            else:
                x_prime = _occlude(views, cfg)
            logits_prime = jax.lax.stop_gradient(
                encode_views(params, adapters, x_prime,
                             tokens=tokens, text_cls=text_cls))
            p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            pp = jax.nn.softmax(logits_prime.astype(jnp.float32), axis=-1)
            cls1 = jnp.argmax(p, axis=-1)
            plpd = (jnp.take_along_axis(p, cls1[:, None], 1)
                    - jnp.take_along_axis(pp, cls1[:, None], 1))[:, 0]
        loss, aux = deyo_loss(
            logits,
            margin_e0=cfg.deyo_margin_e0, deyo_margin=cfg.deyo_margin,
            filter_ent=bool(cfg.filter_ent), selection_p=cfg.selection_p,
            reweight_ent=float(cfg.reweight_ent), plpd=plpd,
            filter_plpd=bool(cfg.filter_plpd),
            plpd_threshold=cfg.plpd_threshold,
            reweight_plpd=float(cfg.reweight_plpd))
        return loss, aux

    # TPT-path selection count (ttl.py:52). The k>=1 floor is a documented
    # divergence: the reference's int(N*p)==0 edge slices an EMPTY view set
    # and avg_entropy of nothing NaNs the loss (ttl.py:56-61) - a crash, not
    # a behavior, so it is not reproduced. (The DeYO filter_ent edge, which
    # the reference DOES define - skip the update - is matched exactly in
    # ops/entropy.deyo_loss.)
    k_sel = max(int(cfg.batch_size * cfg.selection_p), 1)

    def adapt_one(params, text_cls, adapters0, views, key,
                  tokens: Optional[jax.Array] = None) -> AdaptResult:
        # Frozen per-sample state, encoded ONCE and reused by every TTA step
        # (constant within a sample): image mode caches the prefix hidden
        # state (layers [0, window[0]) over all 64 views); text mode caches
        # the full frozen image features.
        img_feats = None
        hidden = None
        if on_image:
            from ..models.clip import vision_prefix
            hidden = jax.lax.stop_gradient(vision_prefix(
                params["vision"], views, clip_cfg.vision, upto=window[0],
                compute_dtype=cd))
        else:
            img_feats = jax.lax.stop_gradient(
                encode_image(params["vision"], views, clip_cfg.vision,
                             compute_dtype=cd))

        def enc(adapters, v, feats, hid):
            return encode_views(params, adapters, v, tokens=tokens,
                                text_cls=text_cls, img_feats=feats,
                                hidden=hid)

        def sub(t, sl):
            return None if t is None else t[sl]

        if zero_shot_aux:
            zs_logits = jax.lax.stop_gradient(
                enc(None, views[:1], sub(img_feats, slice(0, 1)),
                    sub(hidden, slice(0, 1))))[0]
        else:
            zs_logits = jnp.zeros((text_cls.shape[0],) if on_image
                                  else (tokens.shape[0],), jnp.float32)

        def loss_fn(adapters, sel_mask, skey):
            logits = enc(adapters, views, img_feats, hidden)
            if use_deyo:
                loss, aux = deyo_objective(logits, views, adapters, params,
                                           text_cls, tokens, skey)
                n_backward = aux["n_backward"]
            else:
                # TPT objective on LoRA params (deyo_selection=False):
                # select once at step 0, then reuse indices (ttl.py:97-100)
                loss = tpt_loss(logits, sel_mask)
                n_backward = jnp.float32(1.0)
            return loss, n_backward

        if use_deyo:
            sel_mask = jnp.ones((cfg.batch_size,), bool)  # unused
        else:
            # non-differentiable selection, frozen after the first forward
            # (stop-grad indices in the reference, ttl.py:97-100)
            logits0 = jax.lax.stop_gradient(
                enc(adapters0, views, img_feats, hidden))
            _, _, sel_mask = select_confident(logits0, k_sel)

        opt_state = opt.init(adapters0)

        def step(carry, skey):
            adapters, opt_state = carry
            (loss, n_backward), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(adapters, sel_mask, skey)
            new_updates, new_opt_state = opt.update(grads, opt_state,
                                                    adapters)
            # reference skips the optimizer step entirely when every view is
            # filtered out (deyo.py:110-113,184) - without this, AdamW
            # weight decay would still mutate the adapters on a zero loss
            do = n_backward > 0
            adapters = jax.tree.map(
                lambda a, u: jnp.where(do, a + u, a), adapters, new_updates)
            opt_state = jax.tree.map(
                lambda n, o: jnp.where(do, n, o), new_opt_state, opt_state)
            return (adapters, opt_state), loss

        (adapters, _), losses = jax.lax.scan(
            step, (adapters0, opt_state), jax.random.split(key, steps))

        out = jax.lax.stop_gradient(
            enc(adapters, views[:1], sub(img_feats, slice(0, 1)),
                sub(hidden, slice(0, 1))))[0]
        return AdaptResult(logits=out, losses=losses,
                           zero_shot_logits=zs_logits, adapters=adapters)

    return adapt_one


def _truncate_tokens(tokens: Optional[jax.Array]) -> Optional[jax.Array]:
    """EOT-truncate a concrete token table (exact; prompts.needed_ctx_len).
    Centralized here so every surface that builds a text-LoRA step (runner,
    predict, serve, bench tools) gets the short programs."""
    if tokens is None:
        return None
    from ..models.prompts import needed_ctx_len
    return tokens[:, : needed_ctx_len(tokens)]


def make_batched_ttl_fn(clip_cfg: CLIPConfig, cfg: TTLConfig, *,
                        tokens: Optional[jax.Array] = None,
                        zero_shot_aux: bool = False):
    """vmap the episodic program over a batch of test samples and jit it.

    Every sample gets the SAME fresh (adapters0, opt_state) - exactly the
    reference's reset-to-snapshot semantics (custom_clip.py:202-217) - but
    adapts independently; S samples' backward passes batch into one program.

    Returns f(params, text_cls, adapters0, views[S,V,3,H,W], keys[S])
    -> AdaptResult with leading S axis.
    """
    adapt_one = make_ttl_adapt_fn(clip_cfg, cfg, zero_shot_aux=zero_shot_aux)
    if cfg.lora_encoder == "text":
        tokens = _truncate_tokens(tokens)
        fn = lambda p, tc, a0, v, k: adapt_one(p, tc, a0, v, k, tokens=tokens)
    else:
        fn = adapt_one
    batched = jax.vmap(fn, in_axes=(None, None, None, 0, 0))
    # note: no buffer donation - the views buffer never matches an output
    # shape, so donating it only produced XLA warnings
    return jax.jit(batched)


def _make_view_fn_for(cfg: TTLConfig):
    from ..ops.image import make_view_fn
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    return make_view_fn(cfg.batch_size, cfg.resolution,
                        aug_ops=cfg.aug_ops, severity=cfg.aug_severity,
                        out_dtype=cd)


def _jit_fused(batched, n_state: int, mesh=None, extra_constraint=None):
    """jit a fused step f(params, *state, canvases, hs, ws, idxs).

    mesh=None: plain single-device jit. With a mesh: the trailing 4 sample
    args shard over the data axis, leading state args keep their existing
    placement (the runner pre-places params via shard_params / replicate),
    and outputs shard over data.

    Data-only meshes where the bshd attention kernel should run
    (ops.attention.mesh_kernel_mode: TPU backend or an explicit
    TTL_FUSED_ATTENTION=bshd) go through jax.shard_map instead of plain
    GSPMD: the episodic program has zero cross-sample collectives, so
    manual data parallelism runs the measured single-chip program verbatim
    on every device — which is what lets pallas_call (no GSPMD
    partitioning rule) stay on the hot path. Everything else (model-axis
    meshes, einsum routes) keeps the GSPMD jit, with the attention route
    pinned to the einsum so a forced kernel env can never land an
    unpartitionable pallas_call under pjit.
    """
    if mesh is None:
        return jax.jit(batched)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..ops import attention as fa
    from ..parallel.mesh import DATA_AXIS, _has_model_axis
    if not _has_model_axis(mesh) and fa.mesh_kernel_mode(True) == "bshd":
        # constraints are only ever built for model-axis meshes (the text
        # classifier's class shard); this branch would silently drop one
        assert extra_constraint is None, "shard_map route takes no constraint"

        def body(*args):
            with fa.force_mode("bshd"):
                return batched(*args)
        # check_vma off: pallas_call's out_shapes carry no varying-mesh-axes
        # annotation, so the vma type check rejects any kernel inside a
        # checked shard_map (the data-parallel correctness this would police
        # is pinned by tests/test_fused.py sharded==single instead)
        smapped = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(),) * (1 + n_state) + (P(DATA_AXIS),) * 4,
            out_specs=P(DATA_AXIS), check_vma=False)
        return jax.jit(smapped)

    data0 = NamedSharding(mesh, P(DATA_AXIS))

    def fn(*args):
        if extra_constraint is not None:
            args = extra_constraint(*args)
        with fa.force_mode(""):
            return batched(*args)
    return jax.jit(fn,
                   in_shardings=(None,) * (1 + n_state) + (data0,) * 4,
                   out_shardings=data0)


def sample_key(seed: int, idx: jax.Array) -> jax.Array:
    """Per-sample PRNG key, keyed on the dataset position so views (and the
    PLPD draw) are deterministic for a sample regardless of batch
    composition, host assignment, or sample_batch."""
    return jax.random.fold_in(jax.random.PRNGKey(seed), idx)


def make_fused_ttl_fn(clip_cfg: CLIPConfig, cfg: TTLConfig, *,
                      tokens: Optional[jax.Array] = None,
                      mesh=None, n_classes: Optional[int] = None,
                      zero_shot_aux: bool = False):
    """View generation + episodic adaptation as ONE jit'd program.

    The round-1 runner dispatched two programs per batch (device-side view
    expansion, then the adaptation step) plus a key-fold dispatch; fusing
    removes the dispatch round trips and the [S,V,3,H,W] HBM round trip of
    the views buffer, and lets XLA overlap view sampling with the
    frozen-prefix compute.

    Returns f(params, text_cls, adapters0, canvases[S,C,C,3]u8, hs[S],
    ws[S], idxs[S]) -> AdaptResult with leading S axis; idxs are dataset
    positions, turned into per-sample keys via `sample_key(cfg.seed, idx)`.
    Numerics are identical to make_batched_view_fn + make_batched_ttl_fn
    with the same keys (the key feeds the same sub-streams).

    With a mesh, the sample axis shards over the data axis and (given a
    model axis plus a divisible `n_classes`) the text classifier's class
    axis shards over the model axis.
    """
    view_fn = _make_view_fn_for(cfg)
    adapt_one = make_ttl_adapt_fn(clip_cfg, cfg, zero_shot_aux=zero_shot_aux)
    toks = (_truncate_tokens(tokens) if cfg.lora_encoder == "text"
            else None)

    def one(params, text_cls, adapters0, canvas, h, w, idx):
        key = sample_key(cfg.seed, idx)
        views = view_fn(canvas, h, w, key)
        return adapt_one(params, text_cls, adapters0, views, key,
                         tokens=toks)

    batched = jax.vmap(one, in_axes=(None, None, None, 0, 0, 0, 0))

    constraint = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import MODEL_AXIS, _has_model_axis
        if (_has_model_axis(mesh) and n_classes is not None
                and n_classes % mesh.shape[MODEL_AXIS] == 0):
            tc_sh = NamedSharding(mesh, P(MODEL_AXIS, None))

            def constraint(params, text_cls, *rest):
                text_cls = jax.lax.with_sharding_constraint(text_cls, tc_sh)
                return (params, text_cls) + rest

    return _jit_fused(batched, 2, mesh, constraint)


def make_fused_tpt_fn(clip_cfg: CLIPConfig, cfg: TTLConfig, *, mesh=None):
    """Fused view-gen + TPT prompt adaptation (lora_encoder='prompt').

    f(params, pl_state, canvases, hs, ws, idxs) -> (AdaptResult, ctx[S,...]).
    Data-parallel over the sample axis when a mesh is given (the per-sample
    programs are independent, exactly as in the LoRA path).
    """
    view_fn = _make_view_fn_for(cfg)
    adapt_one = make_tpt_adapt_fn(clip_cfg, cfg)

    def one(params, pl_state, canvas, h, w, idx):
        key = sample_key(cfg.seed, idx)
        return adapt_one(params, pl_state, view_fn(canvas, h, w, key), key)

    batched = jax.vmap(one, in_axes=(None, None, 0, 0, 0, 0))
    return _jit_fused(batched, 1, mesh)


def make_fused_cocoop_fn(clip_cfg: CLIPConfig, cfg: TTLConfig, *, mesh=None):
    """Fused view-gen + CoCoOp ctx adaptation (--cocoop).

    f(params, co_state, canvases, hs, ws, idxs) -> CoCoOpResult[S].
    """
    from .cocoop import make_cocoop_adapt_fn
    view_fn = _make_view_fn_for(cfg)
    adapt_one = make_cocoop_adapt_fn(clip_cfg, cfg)

    def one(params, co_state, canvas, h, w, idx):
        key = sample_key(cfg.seed, idx)
        return adapt_one(params, co_state, view_fn(canvas, h, w, key), key)

    batched = jax.vmap(one, in_axes=(None, None, 0, 0, 0, 0))
    return _jit_fused(batched, 1, mesh)


def make_fused_zeroshot_fn(clip_cfg: CLIPConfig, cfg: TTLConfig, *,
                           mesh=None):
    """Fused center-view preprocess + zero-shot classification
    (tta_steps=0; the reference's plain CLIP eval path, ttl.py:243-248).

    f(params, text_cls, canvases, hs, ws, idxs) -> logits [S, C]. idxs are
    accepted for signature uniformity with the adapt paths (no RNG is
    consumed - the eval view is deterministic).
    """
    from ..models.clip import encode_image, l2_normalize
    from ..ops.image import preprocess_center
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

    def batched(params, text_cls, canvases, hs, ws, idxs):
        views = jax.vmap(
            lambda c, h, w: preprocess_center(c, h, w, cfg.resolution,
                                              out_dtype=cd))(canvases, hs, ws)
        vf = l2_normalize(encode_image(params["vision"], views,
                                       clip_cfg.vision, compute_dtype=cd))
        return jnp.exp(params["logit_scale"]) * vf @ text_cls.T

    return _jit_fused(batched, 1, mesh)


# ------------------------------------------------------------------ TPT mode

def make_tpt_adapt_fn(clip_cfg: CLIPConfig, cfg: TTLConfig):
    """TPT: tune the CoOp ctx vectors instead of LoRA (lora_encoder='prompt',
    custom_clip_old.py path + ttl.py:86-110). View image features are frozen,
    so they are encoded once and the per-step work is text-tower only.

    Returns f(params, pl_state, views, key) -> (AdaptResult, adapted_ctx).
    """
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    steps = cfg.tta_steps
    opt = make_optimizer(cfg)
    k_sel = max(int(cfg.batch_size * cfg.selection_p), 1)

    def adapt(params, pl_state, views, key):
        vf = l2_normalize(encode_image(
            params["vision"], views, clip_cfg.vision, compute_dtype=cd))
        ls = jnp.exp(params["logit_scale"])

        # trainable prompt state: ctx always; the learnable class token too
        # when learned_cls is set (the reference optimizes all
        # prompt_learner.parameters(), ttl.py:185 + custom_clip.py:301-310)
        learn_cls = pl_state.cls is not None

        def logits_for(tr):
            state = pl_state
            if learn_cls:
                import dataclasses as _dc
                state = _dc.replace(pl_state, cls=tr["cls"])
            embs = state.assemble(tr["ctx"])
            # remat: the whole text tower is differentiated w.r.t. ctx each
            # step; without it the saved attention probs OOM real class
            # counts (200-class TPT wanted 44 GB at sample_batch 8)
            tf = l2_normalize(text_features_from_embeddings(
                params["text"], embs, pl_state.tokenized, clip_cfg.text,
                compute_dtype=cd, remat=True))
            return ls * vf @ tf.T

        tr0 = {"ctx": pl_state.ctx_init}
        if learn_cls:
            tr0["cls"] = pl_state.cls_init

        # one initial-state forward serves BOTH the zero-shot logits and the
        # confident-view selection: the reference selects once on the first
        # step's forward and freezes the indices (ttl.py:97-100), and at the
        # first step the model state IS the initial state - so the per-step
        # stop-grad selection forward the scan used to run was pure waste
        # (one of four text-tower forwards per sample at tta_steps=1)
        logits0 = jax.lax.stop_gradient(logits_for(tr0))
        zs = logits0[0]
        _, _, sel_mask = select_confident(logits0, k_sel)

        def loss_fn(tr, sel_mask):
            return tpt_loss(logits_for(tr), sel_mask), None

        opt_state = opt.init(tr0)

        def step(carry, _):
            tr, opt_state = carry
            (loss, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(tr, sel_mask)
            updates, opt_state = opt.update(grads, opt_state, tr)
            tr = optax.apply_updates(tr, updates)
            return (tr, opt_state), loss

        (tr, _), losses = jax.lax.scan(
            step, (tr0, opt_state), None, length=steps)
        out = jax.lax.stop_gradient(logits_for(tr))[0]
        return AdaptResult(logits=out, losses=losses, zero_shot_logits=zs,
                           adapters={}), tr["ctx"]

    return adapt
