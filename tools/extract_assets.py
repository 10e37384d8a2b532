"""Extract public *data* assets from the reference checkout into ttl_tpu/data/assets/.

This script copies NO code. It serializes published dataset metadata that the
reference bundles as Python literals / data files into neutral JSON/gz assets:

- ImageNet-1k classnames + the 80 hand-crafted prompt templates
  (reference: data/imagnet_prompts.py) - originally from OpenAI CLIP.
- Per-dataset classname tables (reference: data/cls_to_names.py) - originally
  from CoOp (Zhou et al.).
- ImageNet-A/R/V2 label masks (reference: data/imagenet_variants.py) -
  originally from the ImageNet-A / ImageNet-R / ImageNetV2 releases.
- CLIP BPE merge table (reference: clip/bpe_simple_vocab_16e6.txt.gz) -
  OpenAI CLIP's public tokenizer data, re-serialized (merge lines only).
- CoOp split JSONs (reference: data/data_splits/*.json), re-compressed.

Run once at build time:  python tools/extract_assets.py
"""
import gzip
import importlib.util
import json
import shutil
import sys
from pathlib import Path

REF = Path("/root/reference")
OUT = Path(__file__).resolve().parent.parent / "ttl_tpu" / "data" / "assets"


def load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def main():
    OUT.mkdir(parents=True, exist_ok=True)

    # --- classnames + templates (data/imagnet_prompts.py, data/cls_to_names.py)
    prompts = load_module(REF / "data" / "imagnet_prompts.py", "_ref_prompts")
    (OUT / "imagenet_classnames.json").write_text(
        json.dumps(prompts.imagenet_classes, indent=0))
    (OUT / "imagenet_templates.json").write_text(
        json.dumps(prompts.imagenet_templates, indent=0))

    cls = load_module(REF / "data" / "cls_to_names.py", "_ref_cls")
    tables = {}
    for name in ("flower102", "food101", "dtd", "pets", "sun397",
                 "caltech101", "cars", "ucf101", "aircraft", "eurosat"):
        tables[name] = getattr(cls, f"{name}_classes")
    (OUT / "dataset_classnames.json").write_text(json.dumps(tables, indent=0))

    # --- OOD masks (data/imagenet_variants.py)
    var = load_module(REF / "data" / "imagenet_variants.py", "_ref_var")
    masks = {
        # ImageNet-A: 200 indices into the 1000-class table
        "imagenet_a_indices": var.imagenet_a_mask,
        # ImageNet-R: stored as the 200 kept indices (reference keeps order of
        # all_wnids, i.e. ascending ImageNet class index)
        "imagenet_r_indices": [i for i, m in enumerate(var.imagenet_r_mask) if m],
        # ImageNetV2: 1000 indices in string-sorted ("0","1","10",...) order,
        # matching ImageFolder's lexicographic class directories
        "imagenet_v_indices": var.imagenet_v_mask,
    }
    (OUT / "imagenet_variant_masks.json").write_text(json.dumps(masks, indent=0))

    # --- BPE merges (clip/bpe_simple_vocab_16e6.txt.gz): keep only the merge
    # lines actually used by CLIP's tokenizer (first line is a header comment;
    # CLIP consumes merges[1 : 49152-256-2+1]).
    with gzip.open(REF / "clip" / "bpe_simple_vocab_16e6.txt.gz", "rt",
                   encoding="utf-8") as f:
        merges = f.read().split("\n")
    merges = merges[1: 49152 - 256 - 2 + 1]
    with gzip.open(OUT / "clip_bpe_merges.txt.gz", "wt", encoding="utf-8") as f:
        f.write("\n".join(merges))

    # --- CoOp dataset splits, recompressed as .json.gz
    splits_dir = OUT / "splits"
    splits_dir.mkdir(exist_ok=True)
    for p in sorted((REF / "data" / "data_splits").glob("*.json")):
        data = json.loads(p.read_text())
        with gzip.open(splits_dir / (p.name + ".gz"), "wt", encoding="utf-8") as f:
            json.dump(data, f, separators=(",", ":"))

    # --- CIFAR-10 classnames (data/cifar-10-batches-py/batches.meta)
    import pickle
    with open(REF / "data" / "cifar-10-batches-py" / "batches.meta", "rb") as f:
        meta = pickle.load(f, encoding="latin1")
    (OUT / "cifar10_classnames.json").write_text(
        json.dumps(meta["label_names"], indent=0))

    print("assets written to", OUT)
    for p in sorted(OUT.rglob("*")):
        if p.is_file():
            print(f"  {p.relative_to(OUT)}  {p.stat().st_size}")


if __name__ == "__main__":
    main()
