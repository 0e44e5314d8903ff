"""End-to-end drives of the CLI tools at CI scale (tiny yml config)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TINY_YML = os.path.join(REPO, "tests", "data", "tiny-eval.yml")
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("tool_imgs")
    rng = np.random.default_rng(0)
    for i in range(8):
        Image.fromarray(rng.integers(0, 255, (80, 96, 3), dtype=np.uint8)
                        ).save(str(d / f"x{i}.jpg"))
    return str(d)


def _run(args, timeout=360):
    r = subprocess.run([sys.executable] + args, env=ENV, cwd=REPO,
                       capture_output=True, text=True, timeout=timeout)
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


def test_eval_recon_tool(img_dir):
    out = _run(["tools/eval_recon.py", "--yml-path", TINY_YML,
                "--data-dir", img_dir, "--data_size", "64",
                "--batch-size", "4", "--steps", "2"])
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["n"] == 8
    assert np.isfinite(stats["psnr"]) and np.isfinite(stats["ssim"])


def test_tokenize_corpus_tool(img_dir, tmp_path):
    out_file = str(tmp_path / "toks.npz")
    out = _run(["tools/tokenize_corpus.py", "--yml-path", TINY_YML,
                "--data-dir", img_dir, "--out", out_file,
                "--data_size", "64", "--batch-size", "4"])
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["n"] == 8
    data = np.load(out_file, allow_pickle=True)
    assert data["tokens"].shape == (8, 8)
    assert data["tokens"].dtype == np.int32


def test_tokenize_corpus_tar_shards(img_dir, tmp_path):
    """webdataset-style corpus: tokenize straight from .tar shards."""
    import tarfile

    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    files = sorted(os.listdir(img_dir))
    for s in range(2):
        with tarfile.open(str(shard_dir / f"s{s}.tar"), "w") as tf:
            for name in files[s * 4:(s + 1) * 4]:
                tf.add(os.path.join(img_dir, name), arcname=name)
    out_file = str(tmp_path / "toks_tar.npz")
    out = _run(["tools/tokenize_corpus.py", "--yml-path", TINY_YML,
                "--data-dir", str(shard_dir), "--out", out_file,
                "--data_size", "64", "--batch-size", "4"])
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["n"] == 8
    data = np.load(out_file, allow_pickle=True)
    assert data["tokens"].shape == (8, 8)
    assert all(str(p).startswith("s0/") or str(p).startswith("s1/")
               for p in data["paths"])


def test_eval_recon_rfid_lpips(img_dir):
    """eval_recon with the perceptual-metric nets attached (random weights:
    pins the end-to-end plumbing; real weights produce the paper numbers)."""
    out = _run(["tools/eval_recon.py", "--yml-path", TINY_YML,
                "--data-dir", img_dir, "--data_size", "64",
                "--batch-size", "4", "--steps", "2",
                "--fid-weights", "random", "--lpips-weights", "random"],
               timeout=900)
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["n"] == 8
    assert np.isfinite(stats["rfid"]) and stats["rfid"] >= 0
    assert np.isfinite(stats["lpips"]) and stats["lpips"] >= 0


def test_eval_recon_mesh_equality(img_dir):
    """--mesh 8 (data-parallel over the 8 virtual CPU devices) produces the
    same metrics as the single-device loop — the workload-5 contract: the
    sharded batch + on-device metric sums + host-merged FID moments change
    the execution layout, not the math (VERDICT r2 item 3)."""
    common = ["tools/eval_recon.py", "--yml-path", TINY_YML,
              "--data-dir", img_dir, "--data_size", "64",
              "--batch-size", "8", "--steps", "2",
              "--fid-weights", "random", "--lpips-weights", "random"]
    single = json.loads(_run(common, timeout=900).strip().splitlines()[-1])
    mesh = json.loads(_run(common + ["--mesh", "8"],
                           timeout=900).strip().splitlines()[-1])
    assert mesh["n"] == single["n"] == 8
    for k in ("psnr", "ssim", "rfid", "lpips"):
        np.testing.assert_allclose(mesh[k], single[k], rtol=2e-3, atol=1e-4,
                                   err_msg=k)


def test_tokenize_corpus_mesh_equality(img_dir, tmp_path):
    """--mesh 8 shards each encode batch over the data axis; token ids are
    bit-identical to the single-device run (per-image compute, no cross-batch
    reduction anywhere in the encode path)."""
    a, b = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
    common = ["tools/tokenize_corpus.py", "--yml-path", TINY_YML,
              "--data-dir", img_dir, "--data_size", "64",
              "--batch-size", "8"]
    _run(common + ["--out", a])
    _run(common + ["--out", b, "--mesh", "8"])
    da, db = np.load(a, allow_pickle=True), np.load(b, allow_pickle=True)
    assert list(da["paths"]) == list(db["paths"])
    np.testing.assert_array_equal(da["tokens"], db["tokens"])


def test_tokenize_corpus_serving_precision(img_dir, tmp_path):
    """--encode-precision default drives the full bf16 serving path (bf16
    trunk + routed attention + single-pass VQ) through the production tool;
    margins mirror the serving numerics and the ids match the highest-
    precision run on CPU (fp32 matmuls are exact on CPU either way — the
    flag changes the TPU execution, the math stays the same graph)."""
    a, b = str(tmp_path / "hi.npz"), str(tmp_path / "srv.npz")
    common = ["tools/tokenize_corpus.py", "--yml-path", TINY_YML,
              "--data-dir", img_dir, "--data_size", "64",
              "--batch-size", "4", "--margin-stats"]
    _run(common + ["--out", a])
    out = _run(common + ["--out", b, "--encode-precision", "default"])
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["margin_stats"]["total_tokens"] == 8 * 8
    da, db = np.load(a, allow_pickle=True), np.load(b, allow_pickle=True)
    # bf16 trunk deviates; on this tiny random-weight fixture the id
    # agreement must still be high and every margin non-negative
    agree = float((da["tokens"] == db["tokens"]).mean())
    assert agree >= 0.75, agree
    assert np.all(db["margins"] >= 0)


def test_tokenize_corpus_margin_stats(img_dir, tmp_path):
    out_file = str(tmp_path / "toks_m.npz")
    out = _run(["tools/tokenize_corpus.py", "--yml-path", TINY_YML,
                "--data-dir", img_dir, "--out", out_file,
                "--data_size", "64", "--batch-size", "4", "--margin-stats"])
    stats = json.loads(out.strip().splitlines()[-1])
    ms = stats["margin_stats"]
    assert ms["total_tokens"] == 8 * 8
    assert 0.0 <= ms["min"] <= ms["median"]
    data = np.load(out_file, allow_pickle=True)
    assert data["margins"].shape == (8, 8)
    assert np.all(data["margins"] >= 0)


def test_activation_diff_tool():
    out = _run(["tools/activation_diff.py", "--yml-path", TINY_YML,
                "--data_size", "64", "--batch", "2"])
    lines = [json.loads(ln) for ln in out.strip().splitlines()
             if ln.startswith("{")]
    final = lines[-1]
    assert final["stage"] == "ids" and final["ok"], final
    assert final["mismatches"] == 0
    stages = {ln["stage"] for ln in lines[:-1]}
    assert {"x_embed", "outs", "z", "dist"} <= stages
    assert all(ln["max_abs"] < 1e-4 for ln in lines[:-1])


def test_conformance_tool(img_dir):
    """Random-weight ckpt round-trip through the one-command conformance
    runner: ids bit-exact, margins reported, decode PSNR finite."""
    out = _run(["tools/conformance.py", "--yml-path", TINY_YML,
                "--data-dir", img_dir, "--data_size", "64",
                "--batch-size", "4", "--steps", "2", "--decode"],
               timeout=900)
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["ids_bit_exact"], stats
    assert stats["total_tokens"] == 8 * 8
    assert stats["margin_min"] >= 0
    assert np.isfinite(stats["psnr_decode"])


def test_train_tool_resume(tmp_path):
    """CLI kill-and-resume: 4 steps straight == 2 steps + resume-from 2."""
    # batch divisible by the inherited 8-device CPU mesh's data axis
    common = ["tools/train_tokenizer.py", "--yml-path", TINY_YML,
              "--data_size", "64", "--batch-size", "8", "--synthetic",
              "--log-interval", "1", "--ema-decay", "0.9"]
    out_a = _run(common + ["--steps", "4", "--ckpt-interval", "10",
                           "--ckpt-dir", str(tmp_path / "a")], timeout=600)
    loss_a = json.loads(out_a.strip().splitlines()[-1])["final_loss"]

    _run(common + ["--steps", "2", "--ckpt-interval", "2",
                   "--ckpt-dir", str(tmp_path / "b")], timeout=600)
    out_b = _run(common + ["--steps", "4", "--ckpt-interval", "10",
                           "--ckpt-dir", str(tmp_path / "b"),
                           "--resume-from-steps", "2"], timeout=600)
    loss_b = json.loads(out_b.strip().splitlines()[-1])["final_loss"]
    np.testing.assert_allclose(loss_b, loss_a, rtol=1e-5)


def test_smoke_tool(tmp_path):
    out_dir = str(tmp_path / "smoke")
    _run(["smoke.py", "--yml-path", TINY_YML, "--data_size", "64",
          "--steps", "2", "--image", "/root/reference/test.jpg",
          "--out-dir", out_dir])
    assert os.path.exists(os.path.join(out_dir, "token.npy"))
    assert os.path.exists(os.path.join(out_dir, "re_0_64.png"))
    toks = np.load(os.path.join(out_dir, "token.npy"))
    assert toks.shape == (1, 8)


def test_tokenize_corpus_tar_limit(img_dir, tmp_path):
    """Regression: --limit must bound tar-shard corpora too (it was only
    applied in the loose-image branch)."""
    import tarfile

    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    files = sorted(os.listdir(img_dir))
    with tarfile.open(str(shard_dir / "s0.tar"), "w") as tf:
        for name in files:
            tf.add(os.path.join(img_dir, name), arcname=name)
    out_file = str(tmp_path / "toks_lim.npz")
    out = _run(["tools/tokenize_corpus.py", "--yml-path", TINY_YML,
                "--data-dir", str(shard_dir), "--out", out_file,
                "--data_size", "64", "--batch-size", "4", "--limit", "5"])
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["n"] == 5
    data = np.load(out_file, allow_pickle=True)
    assert data["tokens"].shape[0] == 5


def test_bench_train_tool():
    """Train-step bench: both attention variants time and report MFU keys
    (CPU, tiny config; chip numbers in docs/ARCHITECTURE.md)."""
    out = _run(["tools/bench_train.py", "--yml-path", TINY_YML,
                "--depth", "2", "--batch-size", "2", "--data_size", "64",
                "--iters", "1"], timeout=900)
    stats = json.loads(out.strip().splitlines()[-1])
    assert "flash_step_s" in stats and stats["flash_images_per_s"] > 0
    assert "xla_attn_step_s" in stats
    assert np.isfinite(stats["flash_loss"])


def test_train_tool_save_per_epochs_tar(img_dir, tmp_path):
    """--save-per-epochs 1 on a tar corpus must write the FIRST epoch's
    boundary checkpoint (the epoch length is only learned when the pass
    completes — the lookahead must surface the boundary at the right step)."""
    import tarfile

    for s in ("shard-000.tar", "shard-001.tar"):
        with tarfile.open(tmp_path / s, "w") as tf:
            for f in sorted(os.listdir(img_dir)):
                tf.add(os.path.join(img_dir, f), arcname=f)
    ckpt_dir = tmp_path / "ck"
    # 2 shards x 8 images, batch 8 (divisible by the 8-device data mesh) ->
    # 2 full batches per epoch; 5 steps cross the epoch-1 (step 2) and
    # epoch-2 (step 4) boundaries
    _run(["tools/train_tokenizer.py", "--yml-path", TINY_YML,
          "--data_size", "64", "--batch-size", "8", "--steps", "5",
          "--data-dir", str(tmp_path), "--save-per-epochs", "1",
          "--log-interval", "1", "--ckpt-dir", str(ckpt_dir)], timeout=900)
    saved = sorted(os.listdir(ckpt_dir))
    assert "step_2" in saved, saved   # first epoch boundary
    assert "step_4" in saved, saved   # second


def test_train_tool_resume_shuffled_tar(img_dir, tmp_path):
    """Kill-and-resume on a SHUFFLED tar corpus (--data-seed): the resumed
    trajectory equals the uninterrupted one. The resume skip (2 batches =
    exactly epoch 0) is consumed entirely by the loader's skip_samples path,
    exercising the cross-epoch `n += min(sk, members_seen // B)` accounting
    and the (seed, epoch)-deterministic shard + sample shuffle."""
    import tarfile

    for s in ("shard-000.tar", "shard-001.tar"):
        with tarfile.open(tmp_path / s, "w") as tf:
            for f in sorted(os.listdir(img_dir)):
                tf.add(os.path.join(img_dir, f), arcname=f)
    common = ["tools/train_tokenizer.py", "--yml-path", TINY_YML,
              "--data_size", "64", "--batch-size", "8",
              "--data-dir", str(tmp_path), "--data-seed", "7",
              "--shuffle-buffer", "4", "--log-interval", "1"]
    out_a = _run(common + ["--steps", "4", "--ckpt-interval", "10",
                           "--ckpt-dir", str(tmp_path / "a")], timeout=900)
    loss_a = json.loads(out_a.strip().splitlines()[-1])["final_loss"]

    _run(common + ["--steps", "2", "--ckpt-interval", "2",
                   "--ckpt-dir", str(tmp_path / "b")], timeout=900)
    out_b = _run(common + ["--steps", "4", "--ckpt-interval", "10",
                           "--ckpt-dir", str(tmp_path / "b"),
                           "--resume-from-steps", "2"], timeout=900)
    loss_b = json.loads(out_b.strip().splitlines()[-1])["final_loss"]
    np.testing.assert_allclose(loss_b, loss_a, rtol=1e-5)


def test_train_tool_resume_exact_tar(img_dir, tmp_path):
    """--resume-skip-exact drains DECODED batches for the resume skip:
    trajectory equality on a shuffled tar corpus (the failure-immune resume
    mode; the default cheap raw-member skip is pinned by the test above)."""
    import tarfile

    for s in ("shard-000.tar", "shard-001.tar"):
        with tarfile.open(tmp_path / s, "w") as tf:
            for f in sorted(os.listdir(img_dir)):
                tf.add(os.path.join(img_dir, f), arcname=f)
    common = ["tools/train_tokenizer.py", "--yml-path", TINY_YML,
              "--data_size", "64", "--batch-size", "8",
              "--data-dir", str(tmp_path), "--data-seed", "7",
              "--shuffle-buffer", "4", "--log-interval", "1",
              "--resume-skip-exact"]
    out_a = _run(common + ["--steps", "3", "--ckpt-interval", "10",
                           "--ckpt-dir", str(tmp_path / "a")], timeout=900)
    loss_a = json.loads(out_a.strip().splitlines()[-1])["final_loss"]
    _run(common + ["--steps", "1", "--ckpt-interval", "1",
                   "--ckpt-dir", str(tmp_path / "b")], timeout=900)
    out_b = _run(common + ["--steps", "3", "--ckpt-interval", "10",
                           "--ckpt-dir", str(tmp_path / "b"),
                           "--resume-from-steps", "1"], timeout=900)
    loss_b = json.loads(out_b.strip().splitlines()[-1])["final_loss"]
    np.testing.assert_allclose(loss_b, loss_a, rtol=1e-5)


def test_merge_token_parts(tmp_path):
    np.savez_compressed(tmp_path / "t.part0.npz",
                        tokens=np.arange(8, dtype=np.int32).reshape(2, 4),
                        paths=np.array(["a.jpg", "b.jpg"]))
    np.savez_compressed(tmp_path / "t.part1.npz",
                        tokens=np.arange(4, dtype=np.int32).reshape(1, 4),
                        paths=np.array(["c.jpg"]))
    out = tmp_path / "merged.npz"
    r = _run(["tools/merge_token_parts.py",
              "--glob", str(tmp_path / "t.part*.npz"), "--out", str(out)])
    stats = json.loads(r.strip().splitlines()[-1])
    assert stats["parts"] == 2 and stats["n"] == 3
    z = np.load(out)
    assert list(z["paths"]) == ["a.jpg", "b.jpg", "c.jpg"]
    np.testing.assert_array_equal(z["tokens"][:2],
                                  np.arange(8).reshape(2, 4))
    # duplicate paths across parts fail loudly
    np.savez_compressed(tmp_path / "t.part2.npz",
                        tokens=np.zeros((1, 4), np.int32),
                        paths=np.array(["a.jpg"]))
    import subprocess
    r2 = subprocess.run([sys.executable, "tools/merge_token_parts.py",
                         "--glob", str(tmp_path / "t.part*.npz"),
                         "--out", str(out)], env=ENV, cwd=REPO,
                        capture_output=True, text=True)
    assert r2.returncode != 0 and "duplicate" in r2.stderr


def test_certify_tiers_and_full_circle(tmp_path):
    """Round-5 trained-checkpoint tooling at CI scale: a short training run
    (EMA on) -> certify_tiers (per-tier flips/margins/decode-MSE, raw+EMA)
    -> ref_full_circle (export loads into the unmodified reference,
    bit-exact ids)."""
    lat = str(tmp_path / "lat.npy")
    np.save(lat, np.random.default_rng(0).standard_normal(
        (48, 8, 8, 16)).astype(np.float32))
    ckpt_dir = str(tmp_path / "ck")
    _run(["tools/train_tokenizer.py", "--yml-path", TINY_YML,
          "--latents-file", lat, "--steps", "4", "--batch-size", "8",
          "--ema-decay", "0.9", "--ckpt-interval", "4",
          "--ckpt-dir", ckpt_dir], timeout=600)
    ckpt = os.path.join(ckpt_dir, "step_4")

    out = str(tmp_path / "tiers.jsonl")
    for extra in ([], ["--ema"]):
        _run(["tools/certify_tiers.py", "--ckpt", ckpt,
              "--yml-path", TINY_YML, "--latents-file", lat,
              "--n", "32", "--batch", "16", "--eval-batch", "8",
              "--decode-steps", "2", "--out", out] + extra, timeout=600)
    recs = [json.loads(l) for l in open(out)]
    assert len(recs) == 6  # 3 tiers x {raw, ema}
    by = {(r["tier"], r["ema"]): r for r in recs}
    for ema in (False, True):
        assert by[("highest", ema)]["flip_rate_vs_highest"] == 0.0
        for tier in ("highest", "high", "default"):
            r = by[(tier, ema)]
            assert np.isfinite(r["decode_mse"]) and r["n_tokens"] == 256

    fc = str(tmp_path / "fc.jsonl")
    for extra in ([], ["--ema"]):
        _run(["tools/ref_full_circle.py", "--ckpt", ckpt,
              "--yml-path", TINY_YML, "--latents-file", lat,
              "--n", "8", "--out", fc] + extra, timeout=600)
    frecs = [json.loads(l) for l in open(fc)]
    assert len(frecs) == 2
    for r in frecs:
        assert r["ids_bit_exact"] and r["unexpected_keys"] == 0
        assert r["model_pred_max_abs_diff"] < 1e-4
