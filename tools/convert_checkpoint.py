"""Convert a torch CLIP checkpoint to the fast-loading .npz pytree cache.

Usage:
    python tools/convert_checkpoint.py SRC [--arch ViT-B/16] [--out clip.npz]

SRC can be a HuggingFace CLIPModel .bin/.safetensors (requires --arch) or an
OpenAI clip .pt (architecture shape-inferred). The output .npz loads via
`--checkpoint_path clip.npz` without torch in the loop.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("src")
    p.add_argument("--arch", default=None,
                   help="arch name (required for HF-layout checkpoints)")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from ttl_tpu.models.convert import load_checkpoint, save_pytree
    from ttl_tpu.models.zoo import get_arch

    cfg = get_arch(args.arch) if args.arch else None
    params, cfg = load_checkpoint(args.src, cfg)
    out = args.out or str(Path(args.src).with_suffix(".npz"))
    save_pytree(out, params)
    import jax
    n = sum(int(x.size) for x in jax.tree.leaves(params))
    print(f"wrote {out}: {n/1e6:.1f}M params, "
          f"vision={type(cfg.vision).__name__}")


if __name__ == "__main__":
    main()
