"""Real-TPU drive: shard_map + bshd kernel under a 1-device data-only mesh
(the --mesh_shape product path on TPU; CPU tests run interpret mode and
cannot catch Mosaic-under-shard_map compile issues)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ttl_tpu.adapt.ttl import make_fused_ttl_fn
from ttl_tpu.config import TTLConfig
from ttl_tpu.models.clip import init_clip_params
from ttl_tpu.models.prompts import build_text_classifier, prompt_tokens
from ttl_tpu.models.zoo import get_arch
from ttl_tpu.ops.lora import init_adapters
from ttl_tpu.ops import attention as fa
from ttl_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from ttl_tpu.utils.jaxcache import enable_compilation_cache, \
    honor_platform_env
from ttl_tpu.config import resolve_layer_range

honor_platform_env()
enable_compilation_cache()
assert jax.default_backend() == "tpu", jax.default_backend()

clip_cfg = get_arch("ViT-B/16")
cfg = TTLConfig(arch="ViT-B/16", sample_batch=2)
params = init_clip_params(jax.random.PRNGKey(0), clip_cfg,
                          param_dtype=jnp.bfloat16)
names = [f"class {i}" for i in range(50)]
toks = jnp.asarray(prompt_tokens(names))
text_cls = build_text_classifier(params["text"], toks, clip_cfg.text)
lo, hi = resolve_layer_range(cfg, clip_cfg)
adapters0 = init_adapters(jax.random.PRNGKey(1), hi - lo + 1,
                          clip_cfg.vision.hidden, cfg.rank, cfg.init_method)
rng = np.random.RandomState(0)
S = 2
canv = (rng.rand(S, 256, 256, 3) * 255).astype(np.uint8)
hs = np.full((S,), 240, np.int32)
ws = np.full((S,), 256, np.int32)
idxs = np.arange(S, dtype=np.int32)

# single-device reference (the benched default: plain jit + bshd kernel)
ref = make_fused_ttl_fn(clip_cfg, cfg)(params, text_cls, adapters0,
                                       canv, hs, ws, idxs)
ref_logits = np.asarray(ref.logits)
print("single-device route:", fa.fused_mode())

mesh = make_mesh((1,))
assert fa.mesh_kernel_mode(True) == "bshd"
fn = make_fused_ttl_fn(clip_cfg, cfg, mesh=mesh, n_classes=50)
t0 = time.time()
out = fn(*replicate((params, text_cls, adapters0), mesh),
         *shard_batch((jnp.asarray(canv), jnp.asarray(hs),
                       jnp.asarray(ws), jnp.asarray(idxs)), mesh))
got = np.asarray(out.logits)
print(f"shard_map mesh(1,) compile+run: {time.time() - t0:.0f}s, "
      f"sharding {out.logits.sharding.spec}")
np.testing.assert_allclose(got, ref_logits, rtol=2e-4, atol=2e-4)
print("TPU SHARD_MAP KERNEL OK: mesh(1,) logits == single-device bshd")
