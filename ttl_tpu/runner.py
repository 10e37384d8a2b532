"""End-to-end evaluation driver.

TPU-native equivalent of the reference's main_worker + test_time_adapt_eval
(ttl.py:121-363): per set_id it resolves classnames/masks, builds the text
classifier once (the reference re-encodes it every forward - SURVEY.md
section 5), streams test samples through the host loader, and dispatches ONE
fused jit program per batch (64-view expansion + episodic adaptation +
adapted inference, vmapped over `sample_batch` concurrent samples). Top-1/
Top-5 counts are reduced on device (parallel.eval.make_count_fn - the psum
under a data mesh) and tracked with the reference's meter output format.

Multi-chip: every adaptation mode (LoRA, TPT-prompt, CoCoOp, zero-shot)
shards the sample batch over the mesh's data axis. Multi-host: each process
loads its own shard of the shuffled sample order, batches assemble into
global arrays via make_array_from_process_local_data, and the metric
reduction crosses hosts inside the jit program.
"""
from __future__ import annotations

import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import TTLConfig
from .data.classnames import resolve_classnames
from .data.registry import build_dataset
from .data.views import DEFAULT_CANVAS, SampleLoader
from .models import clip as jclip
from .models.clip import init_clip_params
from .models.convert import load_checkpoint
from .models.prompts import (build_text_classifier, init_prompt_learner,
                             prompt_tokens)
from .models.zoo import get_arch
from .ops.lora import init_adapters
from .utils.checkpoint import load_prompt_state_dict
from .utils.meters import AverageMeter, ProgressMeter, Summary


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
    if cfg.prefix_quant == "int8":
        from .ops.quant import attach_prefix_quant, quant_prefix_len
        # drop_fp frees the fp copies whenever the WHOLE tower quantizes
        # (frozen-vision modes); with an adapted suffix the fp layers stay
        params = attach_prefix_quant(params, quant_prefix_len(cfg, clip_cfg),
                                     drop_fp=True)
    elif cfg.prefix_quant != "none":
        raise ValueError(f"prefix_quant={cfg.prefix_quant!r}: expected "
                         "'none' or 'int8'")
    return clip_cfg, params


def make_adapters0(cfg: TTLConfig, clip_cfg):
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
    from .config import resolve_layer_range
    lo, hi = resolve_layer_range(cfg, clip_cfg)
    return init_adapters(jax.random.PRNGKey(cfg.seed), hi - lo + 1, d,
                         cfg.rank, cfg.init_method)


def evaluate_dataset(set_id: str, cfg: TTLConfig, clip_cfg, params,
                     adapters0, *, dataset=None,
                     max_samples: Optional[int] = None,
                     prompt_ckpt: Optional[dict] = None) -> List[float]:
    """One dataset: returns [top1, top5] percentages (ttl.py:300-363)."""
    classnames = resolve_classnames(set_id)
    toks = jnp.asarray(prompt_tokens(classnames,
                                     cfg.ctx_init.replace("_", " ")))
    if cfg.ensemble and (cfg.cocoop or cfg.lora_encoder != "image"):
        raise ValueError(
            "--ensemble replaces the frozen single-template text classifier "
            "and only applies when that classifier is consumed "
            "(lora_encoder='image', no --cocoop); the "
            f"requested mode (lora_encoder={cfg.lora_encoder!r}, "
            f"cocoop={cfg.cocoop}) builds its prompts elsewhere and would "
            "silently ignore the ensemble table")

    if dataset is None:
        dataset = build_dataset(set_id, cfg)

    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    n_proc = jax.process_count()
    is_main = jax.process_index() == 0

    # --- mesh: every mode shards the sample batch over the data axis (the
    # per-sample episodic programs are independent by construction; the one
    # cross-chip collective is the metric psum in make_count_fn)
    mesh = None
    if jax.device_count() > 1:
        from .parallel.mesh import DATA_AXIS, make_mesh
        m = make_mesh(cfg.mesh_shape)
        if cfg.sample_batch % m.shape[DATA_AXIS] == 0:
            mesh = m
            if is_main:
                print(f"data-parallel eval over mesh {dict(m.shape)}",
                      flush=True)
        else:
            if n_proc > 1:
                raise ValueError(
                    f"multi-host eval requires sample_batch "
                    f"({cfg.sample_batch}) to be a multiple of the data "
                    f"axis ({m.shape[DATA_AXIS]})")
            print(f"WARNING: sample_batch={cfg.sample_batch} is not a "
                  f"multiple of the data axis ({m.shape[DATA_AXIS]}); "
                  f"falling back to single-device eval - set "
                  f"--sample_batch to a multiple to use all "
                  f"{jax.device_count()} devices", flush=True)

    # --- loader: per-host input shard of the (seed-shared) shuffled order;
    # every host executes the same number of dispatches (filler batches are
    # all-padding and masked out of the metrics)
    local_bs = cfg.sample_batch // n_proc if n_proc > 1 else cfg.sample_batch
    if n_proc > 1 and cfg.sample_batch % n_proc != 0:
        raise ValueError(f"sample_batch ({cfg.sample_batch}) must be a "
                         f"multiple of process_count ({n_proc})")
    n_total = len(dataset) if max_samples is None \
        else min(len(dataset), max_samples)
    # canvas: explicit --canvas wins; 0 = auto-fit datasets that declare
    # their max image dim (identical results - crops read only the image
    # area - at up to 64x less host->device transfer for small images)
    canvas = cfg.canvas if cfg.canvas > 0 else \
        (getattr(dataset, "max_image_dim", None) or DEFAULT_CANVAS)

    def _assemble(batch):
        """SampleBatch -> the step's input arrays + validity mask."""
        valid = np.arange(local_bs) < (local_bs - batch.pad)
        return (batch.canvases, batch.heights, batch.widths,
                batch.indices.astype(np.int32),
                batch.labels.astype(np.int32), valid)

    # single-process, single-device: assemble AND device_put in the
    # prefetch thread so the canvas upload (~6-8 MB/step at canvas 512)
    # overlaps device compute instead of serializing into the dispatch
    # path. Results are identical (pure scheduling); multi-host keeps the
    # main-thread make_array_from_process_local_data path and local meshes
    # keep the pjit input path. TTL_UPLOAD_OVERLAP=0 opts out (A/B knob).
    overlap = (n_proc == 1 and mesh is None
               and os.environ.get("TTL_UPLOAD_OVERLAP", "1") != "0")
    # auto-canvas runs additionally shrink each batch to the smallest
    # power-of-two ladder canvas that fits it (data/views.py docstring):
    # bit-identical results, quadratically less upload for small-image
    # batches, at most 3 one-time compiles. Explicit --canvas runs keep the
    # user's exact shape; mesh/multi-host keep one static program.
    buckets = (n_proc == 1 and mesh is None and cfg.canvas == 0
               and os.environ.get("TTL_CANVAS_BUCKETS", "1") != "0")
    loader = SampleLoader(
        dataset, batch_size=local_bs, shuffle=True, seed=cfg.seed,
        canvas=canvas, bucket_canvas=buckets,
        max_samples=max_samples, workers=cfg.workers,
        shard=(jax.process_index(), n_proc) if n_proc > 1 else None,
        total_batches=((n_total + cfg.sample_batch - 1) // cfg.sample_batch
                       if n_proc > 1 else None),
        transform=(lambda b: jax.device_put(_assemble(b))) if overlap
        else None)

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

    from .adapt.ttl import (make_fused_cocoop_fn, make_fused_tpt_fn,
                            make_fused_ttl_fn, make_fused_zeroshot_fn)

    if mesh is not None:
        from .parallel.mesh import replicate, shard_params
        params = shard_params(params, mesh)
        if adapters0 is not None:
            adapters0 = replicate(adapters0, mesh)

    # --- per-mode fused step program: f(params, *state, canv, hs, ws, idxs)
    if use_cocoop:
        # CoCoOp runs even at tta_steps=0 semantics: the reference's final
        # inference ignores the adapted pgen_ctx (see adapt/cocoop.py
        # docstring), so `logits` is the conditioned unadapted prediction
        # either way
        from .adapt.cocoop import init_cocoop
        from .utils.checkpoint import apply_cocoop_ckpt
        co_state = init_cocoop(
            params["text"]["token_embed"].astype(jnp.float32), classnames,
            clip_cfg.vision.proj_dim, jax.random.PRNGKey(cfg.seed),
            cfg.ctx_init)
        if prompt_sd:
            co_state = apply_cocoop_ckpt(co_state, prompt_sd)
        if mesh is not None:
            co_state = replicate(co_state, mesh)
        step_fn = make_fused_cocoop_fn(clip_cfg, cfg, mesh=mesh)
        state = (co_state,)
        get_logits = lambda res: res.logits
    elif use_prompt and cfg.tta_steps > 0:
        pl_state = init_prompt_learner(
            params["text"]["token_embed"].astype(jnp.float32), classnames,
            cfg.ctx_init)
        if prompt_sd:
            from .utils.checkpoint import apply_prompt_ckpt
            pl_state = apply_prompt_ckpt(pl_state, prompt_sd)
        if mesh is not None:
            pl_state = replicate(pl_state, mesh)
        step_fn = make_fused_tpt_fn(clip_cfg, cfg, mesh=mesh)
        state = (pl_state,)
        get_logits = lambda res: res[0].logits
    else:
        if use_prompt:
            # zero-shot in prompt mode classifies with the prompt-learner's
            # own (unadapted) ctx prompts
            pl_state = init_prompt_learner(
                params["text"]["token_embed"].astype(jnp.float32),
                classnames, cfg.ctx_init)
            if prompt_sd:
                from .utils.checkpoint import apply_prompt_ckpt
                pl_state = apply_prompt_ckpt(pl_state, prompt_sd)
            text_cls = jclip.l2_normalize(
                jclip.text_features_from_embeddings(
                    params["text"], pl_state.assemble(pl_state.ctx_init),
                    pl_state.tokenized, clip_cfg.text, compute_dtype=cd))
        elif cfg.ensemble:
            from .models.prompts import build_ensemble_classifier
            text_cls = build_ensemble_classifier(
                params["text"], classnames, clip_cfg.text, compute_dtype=cd)
        else:
            text_cls = build_text_classifier(
                params["text"], toks, clip_cfg.text, compute_dtype=cd)
        if mesh is not None:
            text_cls = replicate(text_cls, mesh)
        if cfg.tta_steps > 0:
            step_fn = make_fused_ttl_fn(clip_cfg, cfg, tokens=toks,
                                        mesh=mesh,
                                        n_classes=len(classnames))
            state = (text_cls, adapters0)
            get_logits = lambda res: res.logits
        else:
            # plain zero-shot on the deterministic eval view (works for
            # every backbone incl. RN50)
            step_fn = make_fused_zeroshot_fn(clip_cfg, cfg, mesh=mesh)
            state = (text_cls,)
            get_logits = lambda res: res

    from .parallel.eval import make_count_fn
    count_fn = make_count_fn(mesh)

    import contextlib

    @contextlib.contextmanager
    def _oom_hint():
        """Surface the one actionable knob on device OOM. Wraps both the
        dispatch (compile-time OOM) and the result fetch (async execution
        OOM is deferred by JAX to the blocking np.asarray in drain)."""
        try:
            yield
        except Exception as e:
            msg = str(e).lower()
            # XLA surfaces allocation failures both as "...out of memory..."
            # and as bare RESOURCE_EXHAUSTED statuses (ADVICE r2)
            if "out of memory" in msg or "resource_exhausted" in msg \
                    or "resource exhausted" in msg:
                raise RuntimeError(
                    f"device OOM on the {set_id} step at "
                    f"sample_batch={cfg.sample_batch} with "
                    f"{len(classnames)} classes; reduce --sample_batch "
                    "(per-sample results are batch-invariant). Every mode "
                    "measured fitting 8/1000 classes on one 16 GB v5e with "
                    "the EOT-truncated prompts (PERF_NOTES.md)"
                ) from e
            raise

    batch_time = AverageMeter("Time", ":6.3f", Summary.NONE)
    top1 = AverageMeter("Acc@1", ":6.2f", Summary.AVERAGE)
    top5 = AverageMeter("Acc@5", ":6.2f", Summary.AVERAGE)
    progress = ProgressMeter(len(loader), [batch_time, top1, top5],
                             prefix="Test: ")

    if n_proc > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from .parallel.mesh import DATA_AXIS
        data0 = NamedSharding(mesh, P(DATA_AXIS))

        def put(local):
            """Assemble each host's local rows into one global array
            (per-host loader shards ride DCN only at input time)."""
            return tuple(
                jax.make_array_from_process_local_data(data0, a)
                for a in local)
    else:
        put = lambda local: local

    def dispatch(batch):
        """Enqueue one device step (async); returns pending count array.
        `batch` is a SampleBatch, or the already-device_put input tuple
        when the loader's upload-overlap transform is active."""
        canv, hs, ws, idxs, labels, valid = (
            batch if isinstance(batch, tuple) else put(_assemble(batch)))
        with _oom_hint():
            res = step_fn(params, *state, canv, hs, ws, idxs)
        return count_fn(get_logits(res), labels, valid)

    # keep device steps in flight so the host-side fetch and decode
    # overlap TPU compute (the per-dispatch round trip is ~40ms on the
    # tunneled chip; the reference's loop serializes it all). Depth 2
    # suffices for ~266ms ViT-B/16 steps; --pipeline_depth raises it for
    # small fast programs (PERF_NOTES "small-program profile")
    DEPTH = max(1, cfg.pipeline_depth)
    in_flight = []
    end = time.time()

    def drain(i, pending):
        with _oom_hint():
            c1, c5, n = (int(x) for x in np.asarray(pending))
        if n > 0:
            top1.update(100.0 * c1 / n, n)
            top5.update(100.0 * c5 / n, n)
        batch_time.update(time.time() - end)
        if (i + 1) % cfg.print_freq == 0 and is_main:
            progress.display(i)

    for i, batch in enumerate(loader):
        in_flight.append((i, dispatch(batch)))
        if len(in_flight) > DEPTH:
            drain(*in_flight.pop(0))
            end = time.time()
    for item in in_flight:
        drain(*item)
        end = time.time()
    if is_main:
        progress.display_summary()
    return [top1.avg, top5.avg]


def run(cfg: TTLConfig, *, datasets: Optional[Dict] = None,
        max_samples: Optional[int] = None) -> Dict[str, List[float]]:
    """Full multi-dataset run with the reference's summary table
    (ttl.py:228-297). `datasets` optionally maps set_id -> dataset object
    (used by tests/bench to bypass the filesystem)."""
    np.random.seed(cfg.seed)
    is_main = jax.process_index() == 0
    clip_cfg, params = load_model(cfg)
    adapters0 = (None if cfg.lora_encoder == "prompt"
                 else make_adapters0(cfg, clip_cfg))
    if is_main:
        # reference startup line (ttl.py:172), plus the episodic state size
        from .ops.lora import adapter_param_count
        n_adapt = adapter_param_count(adapters0) if adapters0 is not None \
            else 0
        extra = f" ({n_adapt:,} LoRA params/sample)" if n_adapt else ""
        print(f"=> Model created: visual backbone {cfg.arch}{extra}",
              flush=True)

    prompt_ckpt = None
    if cfg.load:
        if cfg.cocoop or cfg.lora_encoder == "prompt":
            prompt_ckpt = load_prompt_state_dict(cfg.load)
        elif is_main:
            print(f"WARNING: --load {cfg.load} is a CoOp/CoCoOp prompt "
                  "checkpoint and has no effect in the LoRA modes "
                  "(lora_encoder=image|text); ignoring it, as the reference "
                  "does", flush=True)

    results: Dict[str, List[float]] = {}
    for set_id in cfg.test_sets.split("/"):
        if is_main:
            print(f"evaluating: {set_id}", flush=True)
        ds = datasets.get(set_id) if datasets else None
        if ds is None and set_id != "bongard":
            from .data.registry import dataset_exists, expected_subdir
            sub = expected_subdir(set_id)
            # unknown set_ids fall through to build_dataset's precise
            # NotImplementedError; this check is only for known ids whose
            # data directory is absent
            if sub is not None and not dataset_exists(set_id, cfg.data):
                raise FileNotFoundError(
                    f"dataset {set_id!r} not found under {cfg.data!r} "
                    f"(expected directory {sub!r}); pass the dataset root "
                    "as the positional DATA argument or --data")
        if set_id == "bongard":
            # episodic few-shot protocol (support-prototype classifier);
            # the 2-way task has no meaningful top-5
            from .adapt.bongard import evaluate_bongard
            if ds is None:
                ds = build_dataset(set_id, cfg)
            acc = evaluate_bongard(cfg, ds, clip_cfg, params, adapters0,
                                   max_episodes=max_samples)
            results[set_id] = [acc, 100.0]
        else:
            results[set_id] = evaluate_dataset(
                set_id, cfg, clip_cfg, params, adapters0, dataset=ds,
                max_samples=max_samples, prompt_ckpt=prompt_ckpt)
        if is_main:
            print("=> Acc. on testset [{}]: @1 {:.2f}/ @5 {:.2f}".format(
                set_id, results[set_id][0], results[set_id][1]), flush=True)

    if is_main:
        print("======== Result Summary ========")
        print("params: nstep\tlr\tbs")
        print(f"params: {cfg.tta_steps}\t{cfg.lr}\t{cfg.batch_size}")
        print("\t\t [set_id] \t\t Top-1 acc. \t\t Top-5 acc.")
        print("\t".join(results.keys()))
        print("\t".join(f"{v[0]:.2f}" for v in results.values()))
        if cfg.results_json:
            import dataclasses
            import json
            payload = {
                "results": {k: {"top1": round(v[0], 4),
                                "top5": round(v[1], 4)}
                            for k, v in results.items()},
                "config": {k: (list(v) if isinstance(v, tuple) else v)
                           for k, v in dataclasses.asdict(cfg).items()},
            }
            with open(cfg.results_json, "w") as f:
                json.dump(payload, f, indent=1)
                f.write("\n")
            print(f"results written to {cfg.results_json}", flush=True)
    return results
