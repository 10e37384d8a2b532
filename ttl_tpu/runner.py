"""End-to-end evaluation driver.

TPU-native equivalent of the reference's main_worker + test_time_adapt_eval
(ttl.py:121-363): per set_id it resolves classnames/masks, builds the text
classifier once (the reference re-encodes it every forward - SURVEY.md
section 5), streams test samples through the host loader, expands each into
the 64-view batch on device, runs the episodic TTL program (vmapped over
`sample_batch` concurrent samples), and tracks Top-1/Top-5 with the same
meter output format.
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .adapt.ttl import make_batched_ttl_fn, make_tpt_adapt_fn
from .config import TTLConfig
from .data.classnames import resolve_classnames
from .data.registry import build_dataset
from .data.views import SampleLoader
from .models import clip as jclip
from .models.clip import init_clip_params
from .models.convert import load_checkpoint
from .models.prompts import (build_text_classifier, init_prompt_learner,
                             prompt_tokens)
from .models.zoo import get_arch
from .ops.image import make_batched_view_fn
from .ops.lora import init_adapters
from .utils.checkpoint import load_prompt_state_dict
from .utils.meters import AverageMeter, ProgressMeter, Summary, accuracy


def load_model(cfg: TTLConfig):
    """Build (clip_cfg, params). With no local checkpoint this falls back to
    random init (weights cannot be downloaded in an air-gapped run)."""
    clip_cfg = get_arch(cfg.arch)
    pdtype = jnp.bfloat16 if cfg.param_dtype == "bfloat16" else jnp.float32
    if cfg.checkpoint_path:
        params, clip_cfg = load_checkpoint(cfg.checkpoint_path, clip_cfg,
                                           param_dtype=np.float32)
        params = jax.tree.map(
            lambda a: jnp.asarray(a, pdtype if a.ndim >= 2 else jnp.float32),
            params)
    else:
        print("WARNING: no --checkpoint_path; using random-init CLIP weights "
              "(accuracy will be chance level)", flush=True)
        params = init_clip_params(jax.random.PRNGKey(cfg.seed), clip_cfg,
                                  param_dtype=pdtype)
    return clip_cfg, params


def make_adapters0(cfg: TTLConfig, clip_cfg):
    n_window = cfg.layer_range[1] - cfg.layer_range[0] + 1
    if cfg.lora_encoder == "image":
        if not isinstance(clip_cfg.vision, jclip.VisionConfig):
            # ResNet tower: no transformer q/v to adapt (LoRA is ViT-only,
            # as in the reference). Zero-shot / prompt / text modes still
            # work; evaluate_dataset raises the actionable error if image
            # adaptation is actually requested.
            return None
        d = clip_cfg.vision.hidden
    else:
        d = clip_cfg.text.hidden
    return init_adapters(jax.random.PRNGKey(cfg.seed), n_window, d,
                         cfg.rank, cfg.init_method)


def evaluate_dataset(set_id: str, cfg: TTLConfig, clip_cfg, params,
                     adapters0, *, dataset=None,
                     max_samples: Optional[int] = None,
                     prompt_ckpt: Optional[dict] = None) -> List[float]:
    """One dataset: returns [top1, top5] percentages (ttl.py:300-363)."""
    classnames = resolve_classnames(set_id)
    toks = jnp.asarray(prompt_tokens(classnames, cfg.ctx_init.replace("_", " ")))

    if dataset is None:
        dataset = build_dataset(set_id, cfg)
    if jax.process_count() > 1:
        # Full multi-host eval (per-host input shards + cross-host metric
        # reduction + make_array_from_process_local_data placement) is not
        # wired yet; SampleLoader(shard=...) and parallel.eval expose the
        # pieces. Refuse rather than silently double-count every sample on
        # every host.
        raise NotImplementedError(
            "multi-host evaluation is not supported yet; run one process "
            "(single host) - multi-chip single-host DP/TP works")
    loader = SampleLoader(dataset, batch_size=cfg.sample_batch,
                          shuffle=True, seed=cfg.seed,
                          max_samples=max_samples,
                          workers=cfg.workers)

    view_fn = make_batched_view_fn(
        cfg.batch_size, cfg.resolution,
        out_dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
        else jnp.float32)

    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    _zero_shot_encode = jax.jit(lambda p, x: jclip.encode_image(
        p, x, clip_cfg.vision, compute_dtype=cd))

    use_prompt = cfg.lora_encoder == "prompt"
    if cfg.tta_steps > 0 and cfg.lora_encoder == "image" \
            and not cfg.cocoop \
            and not isinstance(clip_cfg.vision, jclip.VisionConfig):
        raise ValueError(
            f"arch {cfg.arch!r} has a ResNet vision tower; image-encoder "
            "LoRA adaptation requires a ViT backbone (as in the reference). "
            "Use --lora_encoder prompt|text or --tta_steps 0.")
    prompt_sd = prompt_ckpt
    use_cocoop = cfg.cocoop
    if use_cocoop:
        from .adapt.cocoop import init_cocoop, make_cocoop_adapt_fn
        from .utils.checkpoint import apply_cocoop_ckpt
        co_state = init_cocoop(
            params["text"]["token_embed"].astype(jnp.float32), classnames,
            clip_cfg.vision.proj_dim, jax.random.PRNGKey(cfg.seed),
            cfg.ctx_init)
        if prompt_sd:
            co_state = apply_cocoop_ckpt(co_state, prompt_sd)
        adapt_fn = jax.jit(jax.vmap(make_cocoop_adapt_fn(clip_cfg, cfg),
                                    in_axes=(None, None, 0, 0)))
        text_cls = None
    elif use_prompt:
        pl_state = init_prompt_learner(
            params["text"]["token_embed"].astype(jnp.float32), classnames,
            cfg.ctx_init)
        if prompt_sd:
            from .utils.checkpoint import apply_prompt_ckpt
            pl_state = apply_prompt_ckpt(pl_state, prompt_sd)
        adapt_fn = jax.jit(jax.vmap(make_tpt_adapt_fn(clip_cfg, cfg),
                                    in_axes=(None, None, 0, 0)))
        # zero-shot (tta_steps=0) in prompt mode classifies with the
        # prompt-learner's own (unadapted) ctx prompts; only needed then
        text_cls = None
        if cfg.tta_steps == 0:
            text_cls = jclip.l2_normalize(
                jclip.text_features_from_embeddings(
                    params["text"], pl_state.assemble(pl_state.ctx_init),
                    pl_state.tokenized, clip_cfg.text, compute_dtype=cd))
    else:
        text_cls = build_text_classifier(
            params["text"], toks, clip_cfg.text,
            compute_dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
            else jnp.float32)
        n_dev = jax.device_count()
        if n_dev > 1:
            # multi-chip: shard the sample batch over the data axis (the
            # per-sample programs are independent; one psum-equivalent
            # gather at the end). Results are identical to the
            # single-device vmap (test_parallel).
            from .parallel.eval import make_sharded_ttl_fn
            from .parallel.mesh import (DATA_AXIS, make_mesh, replicate,
                                        shard_batch, shard_params)
            mesh = make_mesh(cfg.mesh_shape)
            if cfg.sample_batch % mesh.shape[DATA_AXIS] == 0:
                params = shard_params(params, mesh)
                text_cls, adapters0 = replicate((text_cls, adapters0), mesh)
                base_fn = make_sharded_ttl_fn(clip_cfg, cfg, mesh,
                                              tokens=toks,
                                              n_classes=len(classnames))
                adapt_fn = lambda p, tc, a0, v, k: base_fn(
                    p, tc, a0, shard_batch(v, mesh), shard_batch(k, mesh))
                print(f"data-parallel eval over mesh {dict(mesh.shape)}",
                      flush=True)
            else:
                print(f"WARNING: sample_batch={cfg.sample_batch} is not a "
                      f"multiple of the data axis ({mesh.shape[DATA_AXIS]}); "
                      f"falling back to single-device eval - set "
                      f"--sample_batch to a multiple to use all "
                      f"{n_dev} devices", flush=True)
                adapt_fn = make_batched_ttl_fn(clip_cfg, cfg, tokens=toks)
        else:
            adapt_fn = make_batched_ttl_fn(clip_cfg, cfg, tokens=toks)

    batch_time = AverageMeter("Time", ":6.3f", Summary.NONE)
    top1 = AverageMeter("Acc@1", ":6.2f", Summary.AVERAGE)
    top5 = AverageMeter("Acc@5", ":6.2f", Summary.AVERAGE)
    progress = ProgressMeter(len(loader), [batch_time, top1, top5],
                             prefix="Test: ")

    root_key = jax.random.PRNGKey(cfg.seed)

    def dispatch(batch):
        """Enqueue one device step (async) and return the pending logits."""
        # per-sample keys keyed on dataset position: deterministic views
        view_keys = jax.vmap(lambda idx: jax.random.fold_in(root_key, idx))(
            jnp.asarray(batch.indices, jnp.uint32))
        views = view_fn(jnp.asarray(batch.canvases),
                        jnp.asarray(batch.heights),
                        jnp.asarray(batch.widths), view_keys)
        if use_cocoop:
            # CoCoOp runs even at tta_steps=0 semantics: the reference's
            # final inference ignores the adapted pgen_ctx (see
            # adapt/cocoop.py docstring), so `logits` is the conditioned
            # unadapted prediction either way
            res = adapt_fn(params, co_state, views, view_keys)
            return res.logits
        if cfg.tta_steps > 0:
            if use_prompt:
                res, _ = adapt_fn(params, pl_state, views, view_keys)
            else:
                res = adapt_fn(params, text_cls, adapters0, views, view_keys)
            return res.logits
        # tta_steps == 0: plain zero-shot on the clean view (works for every
        # backbone incl. RN50; prompt mode classifies with the unadapted
        # prompt-learner ctx table built above)
        vf = jclip.l2_normalize(_zero_shot_encode(params["vision"],
                                                  views[:, 0]))
        return jnp.exp(params["logit_scale"]) * vf @ text_cls.T

    # keep a couple of device steps in flight so the host-side fetch and
    # decode overlap TPU compute (the per-dispatch round trip is ~40ms on
    # the tunneled chip; the reference's loop serializes it all)
    DEPTH = 2
    in_flight = []
    end = time.time()

    def drain(i, pending, batch):
        logits = np.asarray(pending)
        n = logits.shape[0] - batch.pad
        acc1, acc5 = accuracy(logits[:n], batch.labels[:n], topk=(1, 5))
        top1.update(acc1, n)
        top5.update(acc5, n)
        batch_time.update(time.time() - end)
        if (i + 1) % cfg.print_freq == 0:
            progress.display(i)

    for i, batch in enumerate(loader):
        in_flight.append((i, dispatch(batch), batch))
        if len(in_flight) > DEPTH:
            drain(*in_flight.pop(0))
            end = time.time()
    for item in in_flight:
        drain(*item)
        end = time.time()
    progress.display_summary()
    return [top1.avg, top5.avg]


def run(cfg: TTLConfig, *, datasets: Optional[Dict] = None,
        max_samples: Optional[int] = None) -> Dict[str, List[float]]:
    """Full multi-dataset run with the reference's summary table
    (ttl.py:228-297). `datasets` optionally maps set_id -> dataset object
    (used by tests/bench to bypass the filesystem)."""
    np.random.seed(cfg.seed)
    clip_cfg, params = load_model(cfg)
    adapters0 = (None if cfg.lora_encoder == "prompt"
                 else make_adapters0(cfg, clip_cfg))

    prompt_ckpt = None
    if cfg.load:
        if cfg.cocoop or cfg.lora_encoder == "prompt":
            prompt_ckpt = load_prompt_state_dict(cfg.load)
        else:
            print(f"WARNING: --load {cfg.load} is a CoOp/CoCoOp prompt "
                  "checkpoint and has no effect in the LoRA modes "
                  "(lora_encoder=image|text); ignoring it, as the reference "
                  "does", flush=True)

    results: Dict[str, List[float]] = {}
    for set_id in cfg.test_sets.split("/"):
        print(f"evaluating: {set_id}", flush=True)
        ds = datasets.get(set_id) if datasets else None
        results[set_id] = evaluate_dataset(
            set_id, cfg, clip_cfg, params, adapters0, dataset=ds,
            max_samples=max_samples, prompt_ckpt=prompt_ckpt)
        print("=> Acc. on testset [{}]: @1 {:.2f}/ @5 {:.2f}".format(
            set_id, results[set_id][0], results[set_id][1]), flush=True)

    print("======== Result Summary ========")
    print("params: nstep\tlr\tbs")
    print(f"params: {cfg.tta_steps}\t{cfg.lr}\t{cfg.batch_size}")
    print("\t\t [set_id] \t\t Top-1 acc. \t\t Top-5 acc.")
    print("\t".join(results.keys()))
    print("\t".join(f"{v[0]:.2f}" for v in results.values()))
    return results
