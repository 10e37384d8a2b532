#!/usr/bin/env python
"""Download + SHA-256-verify OpenAI CLIP checkpoints, then convert to the
fast-loading .npz pytree cache.

Equivalent of the reference's `clip.load` download path (clip/clip.py:28-71:
SHA-named CDN URLs, digest check); kept as a standalone tool because the
runtime never needs network access - evaluation loads the local cache via
`--checkpoint_path`.

Usage (requires egress; the build environment for this repo has none):
    python tools/download_weights.py ViT-B/16 [--root ~/.cache/ttl_tpu]
"""
import argparse
import hashlib
import os
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# OpenAI CLIP release table (public constants; the SHA-256 of each file is
# embedded in its URL - clip/clip.py:29-39)
MODELS = {
    "RN50": "https://openaipublic.azureedge.net/clip/models/afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762/RN50.pt",
    "RN101": "https://openaipublic.azureedge.net/clip/models/8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599/RN101.pt",
    "RN50x4": "https://openaipublic.azureedge.net/clip/models/7e526bd135e493cef0776de27d5f42653e6b4c8bf9e0f653bb11773263205fdd/RN50x4.pt",
    "RN50x16": "https://openaipublic.azureedge.net/clip/models/52378b407f34354e150460fe41077663dd5b39c54cd0bfd2b27167a4a06ec9aa/RN50x16.pt",
    "RN50x64": "https://openaipublic.azureedge.net/clip/models/be1cfb55d75a9666199fb2206c106743da0f6468c9d327f3e0d0a543a9919d9c/RN50x64.pt",
    "ViT-B/32": "https://openaipublic.azureedge.net/clip/models/40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af/ViT-B-32.pt",
    "ViT-B/16": "https://openaipublic.azureedge.net/clip/models/5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f/ViT-B-16.pt",
    "ViT-L/14": "https://openaipublic.azureedge.net/clip/models/b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836/ViT-L-14.pt",
}


def expected_sha(url: str) -> str:
    return url.split("/")[-2]


def download(arch: str, root: str) -> str:
    url = MODELS[arch]
    os.makedirs(root, exist_ok=True)
    target = os.path.join(root, os.path.basename(url))
    if not os.path.exists(target):
        print(f"downloading {url}", flush=True)
        tmp = target + ".part"
        urllib.request.urlretrieve(url, tmp)
        os.replace(tmp, target)
    digest = hashlib.sha256(Path(target).read_bytes()).hexdigest()
    if digest != expected_sha(url):
        raise RuntimeError(
            f"SHA-256 mismatch for {target}: got {digest}, expected "
            f"{expected_sha(url)} - delete the file and retry")
    return target


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("arch", choices=sorted(MODELS))
    p.add_argument("--root",
                   default=os.path.expanduser("~/.cache/ttl_tpu"))
    p.add_argument("--no-convert", action="store_true",
                   help="download + verify only; skip the .npz conversion")
    args = p.parse_args()

    pt = download(args.arch, args.root)
    print(f"verified {pt}")
    if args.no_convert:
        return
    from ttl_tpu.models.convert import load_checkpoint, save_pytree
    params, cfg = load_checkpoint(pt)
    out = str(Path(pt).with_suffix(".npz"))
    save_pytree(out, params)
    print(f"wrote {out} - run with --checkpoint_path {out}")


if __name__ == "__main__":
    main()
