"""End-to-end smoke: CLI -> runner -> loader -> view pipeline -> TTL step.

Runs the full TTL evaluation on a synthetic in-memory dataset with the tiny
arch on the CPU mesh, exercising the same code path a real TPU run takes.
"""
import numpy as np
import pytest

from ttl_tpu.cli import build_parser, config_from_args
from ttl_tpu.config import TTLConfig
from ttl_tpu.data.views import ArrayDataset, ArrayLoader, SampleLoader
from ttl_tpu.runner import run


def make_synthetic_dataset(n=12, size=96, n_classes=10, seed=0):
    """Class-colored noise images of varying size (exercises canvas + crop)."""
    rng = np.random.RandomState(seed)
    images, labels = [], []
    for i in range(n):
        c = i % n_classes
        h = size + (i % 3) * 17
        w = size + (i % 4) * 11
        base = np.zeros((h, w, 3), np.float32)
        base[..., c % 3] = (c + 1) / n_classes
        img = np.clip(base + rng.rand(h, w, 3) * 0.3, 0, 1)
        images.append((img * 255).astype(np.uint8))
        labels.append(c)
    return ArraySizedDataset(images, np.asarray(labels))


class ArraySizedDataset:
    def __init__(self, images, labels):
        self.images = images
        self.labels = labels
        # declared image bound -> the runner auto-fits the canvas
        self.max_image_dim = max(max(im.shape[:2]) for im in images)

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx):
        return self.images[idx], int(self.labels[idx])


CFG = TTLConfig(arch="test-tiny", resolution=64, batch_size=8,
                layer_range=(2, 3), rank=4, test_sets="eurosat",
                compute_dtype="float32", param_dtype="float32",
                sample_batch=2, print_freq=1000)


def test_full_run_smoke(capsys):
    ds = make_synthetic_dataset()
    results = run(CFG, datasets={"eurosat": ds})
    assert "eurosat" in results
    top1, top5 = results["eurosat"]
    assert 0.0 <= top1 <= 100.0 and top1 <= top5 <= 100.0
    out = capsys.readouterr().out
    assert "Result Summary" in out
    assert "Acc@1" in out


def test_results_json_written(tmp_path):
    """--results_json: machine-readable summary alongside the printed table
    (a capability the reference lacks - ttl.py:288-297 only prints)."""
    import json
    ds = make_synthetic_dataset()
    path = tmp_path / "res.json"
    results = run(CFG.replace(results_json=str(path)),
                  datasets={"eurosat": ds})
    payload = json.loads(path.read_text())
    assert payload["results"]["eurosat"]["top1"] == pytest.approx(
        results["eurosat"][0], abs=1e-3)
    assert payload["config"]["arch"] == "test-tiny"
    assert payload["config"]["layer_range"] == [2, 3]
    # the CLI exposes it
    args = build_parser().parse_args(["d/", "--results_json", "x.json"])
    assert config_from_args(args).results_json == "x.json"


@pytest.mark.slow
def test_full_run_deterministic():
    ds = make_synthetic_dataset()
    r1 = run(CFG, datasets={"eurosat": ds})
    r2 = run(CFG, datasets={"eurosat": ds})
    assert r1["eurosat"] == r2["eurosat"]


def test_eurosat_declares_fixed_image_dim(tmp_path):
    """EuroSAT images are a fixed 64x64; the registry declares that bound
    so the runner auto-fits its canvas (64x less host->device upload)."""
    from ttl_tpu.data.registry import build_dataset
    ds = build_dataset("eurosat",
                       CFG.replace(data=str(tmp_path), dataset_mode="test"))
    assert ds.max_image_dim == 64
    assert len(ds) > 0  # bundled CoOp split resolves paths without files


def test_auto_canvas_matches_default_canvas():
    """--canvas 0 auto-fits datasets that declare max_image_dim; the crops
    read only the image area (zero padding beyond it contributes exact
    zeros to the bicubic taps), so results must be identical to the 512
    default at a fraction of the host->device transfer."""
    ds = make_synthetic_dataset()
    assert ds.max_image_dim < 512  # auto actually shrinks the canvas
    auto = run(CFG.replace(canvas=0), datasets={"eurosat": ds})
    full = run(CFG.replace(canvas=512), datasets={"eurosat": ds})
    assert auto["eurosat"] == full["eurosat"]


def test_upload_overlap_does_not_change_results(monkeypatch):
    """TTL_UPLOAD_OVERLAP moves the batch device_put into the loader's
    prefetch thread (pure transfer/compute scheduling); results must be
    bit-identical with it on (default) and off."""
    ds = make_synthetic_dataset()
    monkeypatch.setenv("TTL_UPLOAD_OVERLAP", "1")
    on = run(CFG, datasets={"eurosat": ds})
    monkeypatch.setenv("TTL_UPLOAD_OVERLAP", "0")
    off = run(CFG, datasets={"eurosat": ds})
    assert on["eurosat"] == off["eurosat"]


def test_pipeline_depth_does_not_change_results():
    """--pipeline_depth only changes dispatch/fetch overlap; accuracy must
    be identical at any depth (and depth<1 is clamped to serial)."""
    ds = make_synthetic_dataset()
    base = run(CFG, datasets={"eurosat": ds})
    for depth in (1, 4):
        r = run(CFG.replace(pipeline_depth=depth),
                datasets={"eurosat": ds})
        assert r["eurosat"] == base["eurosat"], depth


def test_zero_tta_steps_is_zero_shot():
    ds = make_synthetic_dataset()
    r = run(CFG.replace(tta_steps=0), datasets={"eurosat": ds})
    assert 0.0 <= r["eurosat"][0] <= 100.0


def test_array_loader_batching():
    ds = make_synthetic_dataset(n=7)
    loader = ArrayLoader(ds, batch_size=3, shuffle=True, seed=0, canvas=160)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[-1].pad == 2
    seen = np.concatenate([b.indices[: 3 - b.pad] for b in batches])
    assert sorted(seen.tolist()) == list(range(7))
    # shuffle is seeded: same order on re-iteration
    batches2 = list(loader)
    np.testing.assert_array_equal(batches[0].indices, batches2[0].indices)


def test_bucket_canvas_selects_smallest_fitting_ladder():
    """bucket_canvas=True shrinks each assembled batch to the smallest
    ladder canvas (canvas/4, canvas/2, canvas) that fits every image;
    pad rows (h=w=1) never inflate the bucket."""
    rng = np.random.RandomState(0)
    small = [(rng.rand(100, 90, 3) * 255).astype(np.uint8)] * 3
    big = [(rng.rand(300, 480, 3) * 255).astype(np.uint8)] * 3
    ds = ArraySizedDataset(small + big, np.zeros(6, np.int64))
    loader = SampleLoader(ds, batch_size=3, shuffle=False, canvas=512,
                          bucket_canvas=True)
    assert loader.bucket_ladder == [128, 256, 512]
    b_small, b_big = list(loader)
    assert b_small.canvases.shape == (3, 128, 128, 3)
    assert b_big.canvases.shape == (3, 512, 512, 3)
    # the [h, w] regions are untouched by the shrink
    np.testing.assert_array_equal(b_small.canvases[0, :100, :90], small[0])
    # short final batch: pad rows must not force a larger bucket
    loader2 = SampleLoader(ds, batch_size=4, shuffle=False, canvas=512,
                           bucket_canvas=True)
    last = list(loader2)[-1]
    assert last.pad == 2 and last.canvases.shape == (4, 512, 512, 3)
    # incompatible with multi-host input shards by contract
    with pytest.raises(AssertionError):
        SampleLoader(ds, batch_size=2, canvas=512, bucket_canvas=True,
                     shard=(0, 2))


def test_bucket_canvas_does_not_change_results(monkeypatch):
    """TTL_CANVAS_BUCKETS (default on for auto-canvas runs) only shrinks
    the shipped canvas to a per-batch ladder size; the device pipeline
    reads the [h, w] image region only, so results are bit-identical."""
    ds = make_synthetic_dataset()
    ds.max_image_dim = 0  # path-dataset behavior: the 512 default canvas
    monkeypatch.setenv("TTL_CANVAS_BUCKETS", "1")
    on = run(CFG.replace(canvas=0), datasets={"eurosat": ds})
    monkeypatch.setenv("TTL_CANVAS_BUCKETS", "0")
    off = run(CFG.replace(canvas=0), datasets={"eurosat": ds})
    assert on["eurosat"] == off["eurosat"]


def test_cli_parses_reference_invocation():
    """The reference launch command must parse unchanged
    (scripts/test_ttl.sh surface)."""
    argv = ["datasets/", "--test_sets", "A/V/R/K", "--arch", "ViT-B/16",
            "-b", "64", "--lr", "5e-3", "--tta_steps", "1",
            "--selection_p", "0.1", "--layer_range", "9,11",
            "--init_method", "xavier", "--lora_encoder", "image",
            "--rank", "16", "--seed", "0", "--gpu", "0"]
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)
    assert cfg.test_sets == "A/V/R/K"
    assert cfg.layer_range == (9, 11)
    assert cfg.rank == 16 and cfg.lr == 5e-3 and cfg.batch_size == 64
    assert cfg.lora_encoder == "image" and cfg.init_method == "xavier"
    assert cfg.deyo_selection is True  # default-on (ttl.py:380)


def test_cli_deyo_selection_false_string_coerced():
    """Documented divergence (docs/MIGRATION.md): the reference's
    --deyo_selection flag is untyped (ttl.py:408), so the shell string
    "False" is truthy and silently keeps DeYO on upstream. This CLI coerces
    false-ish strings to real False — the behavior the user means."""
    for tok, want in [("False", False), ("false", False), ("0", False),
                      ("True", True), ("true", True), ("1", True)]:
        args = build_parser().parse_args(
            ["datasets/", "--deyo_selection", tok])
        assert config_from_args(args).deyo_selection is want, tok


@pytest.mark.slow
def test_aug_list_end_to_end():
    """A non-empty aug_list (the reference's shipped-but-disabled AugMix
    chains, datautils.py:110-138) must run through the full TTL step, and
    actually change the generated views vs the crop+flip default (so a
    silent regression of the config plumbing can't pass)."""
    import jax
    import jax.numpy as jnp

    from ttl_tpu.adapt.ttl import _make_view_fn_for, sample_key
    ds = make_synthetic_dataset()
    cfg = CFG.replace(aug_ops=("autocontrast", "equalize", "posterize"),
                      aug_severity=3)
    r_aug = run(cfg, datasets={"eurosat": ds})
    assert 0.0 <= r_aug["eurosat"][0] <= 100.0

    # load-bearing check: the view fn the adapt programs build from this
    # cfg must differ from the crop+flip default on the augmented views
    # (view 0, the clean eval view, stays deterministic and identical)
    canvas = np.zeros((96, 96, 3), np.uint8)
    canvas[:64, :64] = (np.random.RandomState(0).rand(64, 64, 3) * 255
                        ).astype(np.uint8)
    key = sample_key(cfg.seed, jnp.int32(3))
    h = w = jnp.int32(64)
    v_aug = _make_view_fn_for(cfg)(canvas, h, w, key)
    v_plain = _make_view_fn_for(CFG)(canvas, h, w, key)
    np.testing.assert_array_equal(np.asarray(v_aug[0]),
                                  np.asarray(v_plain[0]))
    assert not np.allclose(np.asarray(v_aug[1:]), np.asarray(v_plain[1:]))


def test_cli_parses_aug_list():
    args = build_parser().parse_args(
        ["--aug_list", "autocontrast,equalize", "--aug_severity", "2"])
    cfg = config_from_args(args)
    assert cfg.aug_ops == ("autocontrast", "equalize")
    assert cfg.aug_severity == 2
    # default stays empty = reference behavior (datautils.py:135-138)
    assert config_from_args(build_parser().parse_args([])).aug_ops == ()


def test_cli_init_method_none():
    """--init_method None must select the reference's None branch
    (== xavier re-init, custom_clip.py:184) from the command line."""
    cfg = config_from_args(
        build_parser().parse_args(["--init_method", "None"]))
    assert cfg.init_method is None


def test_cli_defaults_match_reference():
    cfg = config_from_args(build_parser().parse_args([]))
    ref_defaults = dict(batch_size=64, lr=5e-3, tta_steps=1,
                        selection_p=0.1,
                        init_method="xavier", lora_encoder="image", rank=16,
                        n_ctx=4, ctx_init="a_photo_of_a", seed=0,
                        deyo_margin=0.5, deyo_margin_e0=0.4,
                        filter_ent=0, filter_plpd=0, reweight_ent=1,
                        reweight_plpd=0, aug_type="patch", patch_len=6)
    for k, v in ref_defaults.items():
        assert getattr(cfg, k) == v, k
    # layer_range defaults to arch-relative; on the reference arch
    # (ViT-B/16, 12 layers) it must resolve to the reference's (9, 11)
    from ttl_tpu.config import resolve_layer_range
    from ttl_tpu.models.zoo import get_arch
    assert cfg.layer_range is None
    assert resolve_layer_range(cfg, get_arch(cfg.arch)) == (9, 11)


def test_layer_range_arch_relative_defaults():
    """The None default picks the LAST 3 layers of the adapted tower
    (the reference's intent, ttl.py:372): unchanged on 12-layer towers,
    (21, 23) on ViT-L/14 - NOT the mid-tower (9, 11) that forces 12
    differentiated suffix layers. Explicit --layer_range still wins."""
    from ttl_tpu.config import TTLConfig, resolve_layer_range
    from ttl_tpu.models.zoo import get_arch

    base = TTLConfig()
    assert resolve_layer_range(base, get_arch("ViT-B/16")) == (9, 11)
    assert resolve_layer_range(base, get_arch("ViT-B/32")) == (9, 11)
    assert resolve_layer_range(base, get_arch("ViT-L/14")) == (21, 23)
    assert resolve_layer_range(base, get_arch("ViT-L/14@336px")) == (21, 23)
    # text/prompt modes adapt the 12-layer text tower on every arch
    for mode in ("text", "prompt"):
        assert resolve_layer_range(base.replace(lora_encoder=mode),
                                   get_arch("ViT-L/14")) == (9, 11)
        assert resolve_layer_range(base.replace(lora_encoder=mode),
                                   get_arch("RN50")) == (9, 11)
    # explicit override is returned verbatim
    assert resolve_layer_range(base.replace(layer_range=(5, 7)),
                               get_arch("ViT-L/14")) == (5, 7)
    # CLI: the flag parses to an explicit window; omitting it keeps None
    assert config_from_args(build_parser().parse_args(
        ["--layer_range", "21,23"])).layer_range == (21, 23)
    assert config_from_args(build_parser().parse_args([])).layer_range is None


@pytest.mark.slow
def test_sample_batch_invariance():
    """Per-sample results must not depend on how many samples are vmapped
    together (episodic independence + per-index view keys)."""
    ds = make_synthetic_dataset()
    r1 = run(CFG.replace(sample_batch=1), datasets={"eurosat": ds})
    r3 = run(CFG.replace(sample_batch=3), datasets={"eurosat": ds})
    assert r1["eurosat"] == pytest.approx(r3["eurosat"], abs=1e-6)


def test_pytree_checkpoint_cache(tmp_path):
    """save_pytree/load_pytree roundtrip feeds the runner unchanged."""
    import jax
    import numpy as np

    from ttl_tpu.models.clip import init_clip_params
    from ttl_tpu.models.convert import load_pytree, save_pytree
    from ttl_tpu.models.zoo import TEST_TINY

    p = init_clip_params(jax.random.PRNGKey(0), TEST_TINY)
    path = tmp_path / "clip.npz"
    save_pytree(str(path), p)
    back = load_pytree(str(path))
    a = {jax.tree_util.keystr(k): np.asarray(v)
         for k, v in jax.tree_util.tree_leaves_with_path(p)}
    b = {jax.tree_util.keystr(k): np.asarray(v)
         for k, v in jax.tree_util.tree_leaves_with_path(back)}
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_text_lora_mode_runs():
    ds = make_synthetic_dataset(n=6)
    r = run(CFG.replace(lora_encoder="text", sample_batch=3),
            datasets={"eurosat": ds})
    assert 0.0 <= r["eurosat"][0] <= 100.0


def test_tpt_prompt_mode_runs():
    ds = make_synthetic_dataset(n=6)
    r = run(CFG.replace(lora_encoder="prompt", sample_batch=3),
            datasets={"eurosat": ds})
    assert 0.0 <= r["eurosat"][0] <= 100.0


def test_loader_sharding_partitions_samples():
    """Multi-host input sharding: shards are disjoint and cover the order."""
    ds = make_synthetic_dataset(n=10)
    parts = []
    for i in range(3):
        loader = SampleLoader(ds, batch_size=2, shuffle=True, seed=0,
                              canvas=160, shard=(i, 3))
        parts.append([int(x) for b in loader
                      for x in b.indices[: 2 - b.pad]])
    flat = sum(parts, [])
    assert sorted(flat) == list(range(10))
    assert len(set(map(tuple, parts))) == 3


@pytest.mark.parametrize("mode_kw", [
    {"lora_encoder": "prompt"},            # TPT prompt-ctx
    {"cocoop": True},                      # CoCoOp
    {"tta_steps": 0},                      # zero-shot
])
@pytest.mark.slow
def test_runner_mesh_path_matches_fallback(mode_kw):
    """Every adaptation mode through the RUNNER on the 8-device mesh
    (sample_batch=8 engages the data-parallel dispatch) must equal the
    single-device fallback (sample_batch=2 is not divisible -> no mesh):
    per-sample keys are position-folded, so results are batch-invariant."""
    ds = make_synthetic_dataset(n=10)
    meshed = run(CFG.replace(sample_batch=8, **mode_kw),
                 datasets={"eurosat": ds})
    single = run(CFG.replace(sample_batch=2, **mode_kw),
                 datasets={"eurosat": ds})
    np.testing.assert_allclose(meshed["eurosat"], single["eurosat"],
                               rtol=0, atol=1e-9)


def test_cocoop_mode_runs():
    """--cocoop must actually route to the CoCoOp adapt path."""
    ds = make_synthetic_dataset(n=4)
    r = run(CFG.replace(cocoop=True, sample_batch=2),
            datasets={"eurosat": ds})
    assert 0.0 <= r["eurosat"][0] <= 100.0


def test_prompt_mode_zero_shot():
    """--lora_encoder prompt --tta_steps 0: classify with the unadapted
    prompt-learner ctx table (regression: text_cls used to be None here)."""
    ds = make_synthetic_dataset(n=4)
    r = run(CFG.replace(lora_encoder="prompt", tta_steps=0, sample_batch=2),
            datasets={"eurosat": ds})
    assert 0.0 <= r["eurosat"][0] <= 100.0


def test_load_prompt_checkpoint(tmp_path):
    """--load applies a CoOp ctx checkpoint to the prompt learner."""
    import torch

    ctx = np.full((4, 32), 0.25, np.float32)
    ckpt = {"state_dict": {"prompt_learner.ctx": torch.tensor(ctx),
                           "token_prefix": torch.zeros(1),
                           "token_suffix": torch.zeros(1)},
            "epoch": 3}
    path = tmp_path / "coop.pth.tar"
    torch.save(ckpt, path)
    ds = make_synthetic_dataset(n=2)
    r = run(CFG.replace(lora_encoder="prompt", load=str(path),
                        sample_batch=2), datasets={"eurosat": ds})
    assert 0.0 <= r["eurosat"][0] <= 100.0


@pytest.mark.slow
def test_multichip_runner_matches_single_device():
    """With sample_batch divisible by the device count the runner goes
    data-parallel over the virtual 8-CPU mesh; accuracy must match the
    single-device vmap path exactly."""
    ds = make_synthetic_dataset(n=16)
    r8 = run(CFG.replace(sample_batch=8), datasets={"eurosat": ds})
    r2 = run(CFG.replace(sample_batch=2), datasets={"eurosat": ds})
    assert r8["eurosat"] == pytest.approx(r2["eurosat"], abs=1e-6)
