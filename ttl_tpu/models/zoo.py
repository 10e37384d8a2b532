"""Model registry: CLIP architecture configs by name.

Mirrors the reference's arch surface (`--arch ViT-B/16|RN50`, ttl.py:369,386;
shape inference in clip/model.py:428-451). The TTL LoRA path is ViT-only in
the reference (HF `openai/clip-vit-base-patch16`, custom_clip.py:581); the
RN50 family serves the prompt/zero-shot paths, as there.
"""
from __future__ import annotations

from .clip import CLIPConfig, TextConfig, VisionConfig
from .resnet import RESNET_ARCHS

ARCHS = {
    # ResNet CLIP family (clip/model.py:96-155): prompt/zero-shot paths only;
    # LoRA adaptation targets the ViT q/v projections as in the reference.
    # The x4/x16/x64 EfficientNet-style scalings follow the published CLIP
    # model zoo (clip/clip.py:30-39 _MODELS).
    "RN50": CLIPConfig(
        vision=RESNET_ARCHS["RN50"],
        text=TextConfig(hidden=512, layers=12, heads=8, proj_dim=1024),
    ),
    "RN101": CLIPConfig(
        vision=RESNET_ARCHS["RN101"],
        text=TextConfig(hidden=512, layers=12, heads=8, proj_dim=512),
    ),
    "RN50x4": CLIPConfig(
        vision=RESNET_ARCHS["RN50x4"],
        text=TextConfig(hidden=640, layers=12, heads=10, proj_dim=640),
    ),
    "RN50x16": CLIPConfig(
        vision=RESNET_ARCHS["RN50x16"],
        text=TextConfig(hidden=768, layers=12, heads=12, proj_dim=768),
    ),
    "RN50x64": CLIPConfig(
        vision=RESNET_ARCHS["RN50x64"],
        text=TextConfig(hidden=1024, layers=12, heads=16, proj_dim=1024),
    ),
    "ViT-B/16": CLIPConfig(
        vision=VisionConfig(hidden=768, layers=12, heads=12, proj_dim=512,
                            patch=16, image_size=224),
        text=TextConfig(hidden=512, layers=12, heads=8, proj_dim=512),
    ),
    "ViT-B/32": CLIPConfig(
        vision=VisionConfig(hidden=768, layers=12, heads=12, proj_dim=512,
                            patch=32, image_size=224),
        text=TextConfig(hidden=512, layers=12, heads=8, proj_dim=512),
    ),
    "ViT-L/14": CLIPConfig(
        vision=VisionConfig(hidden=1024, layers=24, heads=16, proj_dim=768,
                            patch=14, image_size=224),
        text=TextConfig(hidden=768, layers=12, heads=12, proj_dim=768),
    ),
    "ViT-L/14@336px": CLIPConfig(
        vision=VisionConfig(hidden=1024, layers=24, heads=16, proj_dim=768,
                            patch=14, image_size=336),
        text=TextConfig(hidden=768, layers=12, heads=12, proj_dim=768),
    ),
}

# tiny config for unit tests / CPU parity runs (also registered as an arch
# so the CLI can smoke-run end-to-end on CPU: --arch test-tiny)
TEST_TINY = CLIPConfig(
    vision=VisionConfig(hidden=32, layers=4, heads=2, proj_dim=16,
                        patch=16, image_size=64),
    text=TextConfig(hidden=32, layers=4, heads=2, proj_dim=16,
                    vocab=49408, ctx=77),
)


ARCHS["test-tiny"] = TEST_TINY


def get_arch(name: str) -> CLIPConfig:
    if name not in ARCHS:
        raise KeyError(f"unknown arch {name!r}; available: {sorted(ARCHS)}")
    return ARCHS[name]
