"""Batch offline prediction: adapt-and-classify a directory of images.

The runner (ttl_tpu.runner) evaluates *labeled* datasets; this is the
label-free product surface: walk a directory, run every image through the
full episodic TTL step at pipeline speed, and write one JSON line per image
with the adapted top-k labels, confidences, and the zero-shot label.

    python -m ttl_tpu.predict IMAGES_DIR --test_sets I \\
        --checkpoint_path clip.npz --out predictions.jsonl
"""
from __future__ import annotations

import argparse
import json
import os
import sys
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


class ImageDirDataset:
    """All images under a directory (recursive, sorted), labels unused."""

    def __init__(self, root: str):
        self.paths: List[str] = []
        for dirpath, _, files in sorted(os.walk(root)):
            for f in sorted(files):
                if f.lower().endswith(IMAGE_EXTS):
                    self.paths.append(os.path.join(dirpath, f))
        if not self.paths:
            raise FileNotFoundError(f"no images under {root!r} "
                                    f"(looked for {', '.join(IMAGE_EXTS)})")

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        return self.paths[i], 0


def predict_directory(cfg, classnames, *, dataset=None, topk: int = 5,
                      out=sys.stdout) -> int:
    """Stream `cfg.data` (or `dataset`) through the fused TTL step and write
    one JSON line per image to `out`. Returns the number of images."""
    from .adapt.ttl import make_fused_ttl_fn, make_fused_zeroshot_fn
    from .data.views import DEFAULT_CANVAS, SampleLoader
    from .models.prompts import build_text_classifier, prompt_tokens
    from .runner import load_model, make_adapters0

    clip_cfg, params = load_model(cfg)
    from .models.clip import VisionConfig
    if cfg.tta_steps > 0 and cfg.lora_encoder == "prompt":
        raise ValueError(
            "batch prediction serves the LoRA modes (lora_encoder="
            "'image'|'text'); for TPT prompt adaptation use the CLI runner")
    if cfg.tta_steps > 0 and cfg.lora_encoder == "image" \
            and not isinstance(clip_cfg.vision, VisionConfig):
        raise ValueError(
            f"arch {cfg.arch!r} has a ResNet vision tower; image-encoder "
            "LoRA adaptation requires a ViT backbone. Use "
            "--lora_encoder text or --tta_steps 0.")
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    toks = jnp.asarray(prompt_tokens(classnames,
                                     cfg.ctx_init.replace("_", " ")))
    text_cls = build_text_classifier(params["text"], toks, clip_cfg.text,
                                     compute_dtype=cd)
    if cfg.tta_steps > 0:
        adapters0 = make_adapters0(cfg, clip_cfg)
        # predict output reports the pre-adaptation label too, so this
        # surface opts into the zero-shot aux pass
        step_fn = make_fused_ttl_fn(clip_cfg, cfg, tokens=toks,
                                    zero_shot_aux=True)

        def run_step(batch):
            res = step_fn(params, text_cls, adapters0, batch.canvases,
                          batch.heights, batch.widths,
                          batch.indices.astype(np.int32))
            return res.logits, res.zero_shot_logits
    else:
        zs_fn = make_fused_zeroshot_fn(clip_cfg, cfg)

        def run_step(batch):
            logits = zs_fn(params, text_cls, batch.canvases, batch.heights,
                           batch.widths, batch.indices.astype(np.int32))
            return logits, logits

    ds = dataset if dataset is not None else ImageDirDataset(cfg.data)
    # --canvas: same auto-fit rule as the eval loop (runner.py) - explicit
    # size wins, datasets that declare max_image_dim shrink the upload
    canvas = cfg.canvas if cfg.canvas > 0 else \
        (getattr(ds, "max_image_dim", None) or DEFAULT_CANVAS)
    loader = SampleLoader(ds, batch_size=cfg.sample_batch, shuffle=False,
                          workers=cfg.workers, canvas=canvas)

    n_written = 0

    def drain(batch, pending):
        nonlocal n_written
        logits, zs = (np.asarray(x, np.float32) for x in pending)
        n = logits.shape[0] - batch.pad
        probs = np.exp(logits[:n] - logits[:n].max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        paths = getattr(ds, "paths", None)  # avoid re-decoding via ds[i]
        for row, (p, z) in enumerate(zip(probs, zs)):
            order = np.argsort(-p)[:topk]
            idx = int(batch.indices[row])
            out.write(json.dumps({
                "path": paths[idx] if paths is not None else idx,
                "label": classnames[int(order[0])],
                "topk": [{"label": classnames[int(i)],
                          "prob": round(float(p[i]), 6)} for i in order],
                "zero_shot_label": classnames[int(np.argmax(z))],
            }) + "\n")
            n_written += 1

    in_flight = []
    for batch in loader:
        in_flight.append((batch, run_step(batch)))
        if len(in_flight) > 2:
            drain(*in_flight.pop(0))
    for item in in_flight:
        drain(*item)
    out.flush()
    return n_written


def main(argv=None):
    from .config import TTLConfig
    from .data.classnames import resolve_classnames
    from .utils.jaxcache import enable_compilation_cache, honor_platform_env

    p = argparse.ArgumentParser(description="TTL batch prediction")
    p.add_argument("data", metavar="IMAGES_DIR")
    p.add_argument("--test_sets", default="I",
                   help="set_id whose classname table to predict over")
    p.add_argument("--classnames", default=None,
                   help="JSON file with a classname list (overrides "
                        "--test_sets)")
    p.add_argument("--arch", default="ViT-B/16")
    p.add_argument("--resolution", default=224, type=int)
    p.add_argument("--checkpoint_path", default=None)
    p.add_argument("--tta_steps", default=1, type=int)
    p.add_argument("--lora_encoder", default="image",
                   choices=["image", "text"])
    p.add_argument("--sample_batch", default=8, type=int)
    p.add_argument("--prefix_quant", default="none",
                   choices=["none", "int8"],
                   help="int8-quantize the frozen vision prefix "
                        "(throughput over exact parity; see PERF_NOTES)")
    p.add_argument("--canvas", default=0, type=int,
                   help="host->device canvas edge in px (0 = 512); set to "
                        "the directory's max image dim to cut upload "
                        "bandwidth - larger images are downscaled to fit")
    p.add_argument("--topk", default=5, type=int)
    p.add_argument("--out", default=None, help="output JSONL (default "
                                               "stdout)")
    args = p.parse_args(argv)

    honor_platform_env()  # entry point: JAX_PLATFORMS env is authoritative
    enable_compilation_cache()
    cfg = TTLConfig(data=args.data, arch=args.arch,
                    resolution=args.resolution,
                    checkpoint_path=args.checkpoint_path,
                    tta_steps=args.tta_steps,
                    lora_encoder=args.lora_encoder,
                    sample_batch=args.sample_batch, canvas=args.canvas,
                    prefix_quant=args.prefix_quant)
    classnames = (json.load(open(args.classnames))
                  if args.classnames else resolve_classnames(args.test_sets))
    sink = open(args.out, "w") if args.out else sys.stdout
    try:
        n = predict_directory(cfg, classnames, topk=args.topk, out=sink)
    finally:
        if args.out:
            sink.close()
    print(f"wrote {n} predictions", file=sys.stderr)


if __name__ == "__main__":
    main()
