"""Native C++ image loader: decode/resize/crop/normalize parity vs PIL,
prefetch loader mechanics."""

import os
import subprocess

import numpy as np
import pytest

from selftoktokenizer_tpu.data.native import (
    NativeImageLoader, native_available, preprocess_file)
from selftoktokenizer_tpu.pipeline.preprocess import preprocess_pil

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def build_native():
    subprocess.run(["make", "-C", os.path.join(REPO, "native")], check=True,
                   capture_output=True)
    assert native_available()


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (w, h) in enumerate([(100, 80), (64, 120), (256, 256), (90, 90)]):
        arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        p = str(d / f"im{i}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
        pj = str(d / f"im{i}.jpg")
        Image.fromarray(arr).save(pj, quality=95)
        paths.append(pj)
    return paths


def test_preprocess_matches_pil_on_png(img_dir):
    from PIL import Image

    for p in img_dir:
        if not p.endswith(".png"):
            continue
        got = preprocess_file(p, 64)
        want = preprocess_pil(Image.open(p).convert("RGB"), 64)
        assert got.shape == want.shape == (1, 64, 64, 3)
        # bilinear kernels differ slightly in rounding; uint8-level closeness
        diff = np.abs(got - want).max() * 127.5
        assert diff <= 3.0, f"{p}: max uint8 diff {diff}"


def test_preprocess_jpeg_decodes(img_dir):
    for p in img_dir:
        if p.endswith(".jpg"):
            out = preprocess_file(p, 64)
            assert out.shape == (1, 64, 64, 3)
            assert -1.0 <= out.min() and out.max() <= 1.0


def test_prefetch_loader(img_dir):
    loader = NativeImageLoader(img_dir * 4, size=64, batch=8, n_threads=2)
    total = 0
    batches = 0
    for batch in loader:
        assert batch.shape[1:] == (64, 64, 3)
        total += batch.shape[0]
        batches += 1
    stats = loader.stats()
    assert stats["failed"] == 0
    assert total == len(img_dir) * 4 == stats["decoded"]
    loader.close()


def _make_shards(img_dir, tmp_path, n_shards=2):
    import tarfile

    shards = []
    per = len(img_dir) // n_shards
    for s in range(n_shards):
        sp = str(tmp_path / f"shard-{s:04d}.tar")
        with tarfile.open(sp, "w") as tf:
            for p in img_dir[s * per:(s + 1) * per]:
                tf.add(p, arcname=os.path.basename(p))
        shards.append(sp)
    return shards


def test_tar_shard_loader(img_dir, tmp_path):
    """webdataset-style sharded-tar ingestion: sequential shard streaming,
    native bytes decode, keys carried with rows, decode == per-file path."""
    from selftoktokenizer_tpu.data.native import TarShardLoader

    shards = _make_shards(img_dir, tmp_path)
    loader = TarShardLoader(shards, size=64, batch=3, n_threads=2)
    total, keys = 0, []
    for imgs, names in loader:
        assert imgs.shape[1:] == (64, 64, 3) and imgs.dtype == np.float32
        assert len(names) == imgs.shape[0]
        total += imgs.shape[0]
        keys += list(names)
    assert total == len(img_dir)
    assert loader.stats() == {"decoded": len(img_dir), "failed": 0}
    assert keys[0].startswith("shard-0000/")
    # per-member decode equals the per-file native path
    first = keys[0].split("/", 1)[1]
    src = [p for p in img_dir if os.path.basename(p) == first][0]
    loader2 = TarShardLoader(shards[:1], size=64, batch=1)
    imgs0, names0 = next(iter(loader2))
    np.testing.assert_array_equal(imgs0, preprocess_file(src, 64))


def test_tar_shuffle_deterministic(img_dir, tmp_path):
    """webdataset-parity training semantics: (seed, epoch) fully determines
    the shard order AND the sample-shuffle emission order; a different epoch
    reshuffles; the shuffled stream is a permutation of the sequential one."""
    from selftoktokenizer_tpu.data.native import TarShardLoader, shuffle_shards

    shards = _make_shards(img_dir, tmp_path, n_shards=4)

    def run(**kw):
        keys = []
        for _, names in TarShardLoader(shards, size=64, batch=3,
                                       n_threads=2, **kw):
            keys += list(names)
        return keys

    seq = run()
    a = run(seed=5, epoch=0, shuffle_buffer=4)
    b = run(seed=5, epoch=0, shuffle_buffer=4)
    c = run(seed=5, epoch=1, shuffle_buffer=4)
    assert a == b  # deterministic given (seed, epoch)
    assert sorted(a) == sorted(seq)  # a permutation, nothing lost
    assert a != seq and a != c  # it actually shuffles / reshuffles per epoch
    # shard-level permutation is deterministic too
    assert shuffle_shards(shards, 5, 0) == shuffle_shards(shards, 5, 0)
    assert shuffle_shards(shards, 5, 0) != shuffle_shards(shards, 5, 1)


def test_tar_skip_resume(img_dir, tmp_path):
    """Mid-epoch resume: skip_samples=N continues the deterministic shuffled
    stream exactly where a run that consumed N samples stopped — and the
    skipped prefix is never decoded (decoded-counter contract)."""
    from selftoktokenizer_tpu.data.native import TarShardLoader

    shards = _make_shards(img_dir, tmp_path, n_shards=4)
    kw = dict(size=64, batch=2, n_threads=2, seed=9, epoch=3,
              shuffle_buffer=5)

    full_keys, full_rows = [], []
    for imgs, names in TarShardLoader(shards, **kw):
        full_keys += list(names)
        full_rows += [imgs[i] for i in range(imgs.shape[0])]

    skip = 6
    res = TarShardLoader(shards, skip_samples=skip, **kw)
    res_keys, res_rows = [], []
    for imgs, names in res:
        res_keys += list(names)
        res_rows += [imgs[i] for i in range(imgs.shape[0])]
    assert res_keys == full_keys[skip:]
    np.testing.assert_array_equal(np.stack(res_rows),
                                  np.stack(full_rows[skip:]))
    assert res.stats()["decoded"] == len(full_keys) - skip
    assert res.members_seen == len(full_keys)
    # skip past the end of the corpus: clean empty iteration
    assert list(TarShardLoader(shards, skip_samples=10_000, **kw)) == []


def test_tar_shard_loader_bad_member(img_dir, tmp_path):
    import tarfile

    from selftoktokenizer_tpu.data.native import TarShardLoader

    bad = str(tmp_path / "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"junk bytes")
    sp = str(tmp_path / "mix.tar")
    with tarfile.open(sp, "w") as tf:
        tf.add(img_dir[0], arcname="ok.png")
        tf.add(bad, arcname="bad.jpg")
    loader = TarShardLoader([sp], size=64, batch=4)
    total = sum(i.shape[0] for i, _ in loader)
    assert total == 1
    assert loader.stats()["failed"] == 1


def test_loader_counts_bad_files(img_dir, tmp_path):
    bad = str(tmp_path / "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"not an image at all")
    loader = NativeImageLoader([img_dir[0], bad], size=64, batch=2)
    total = sum(b.shape[0] for b in loader)
    assert total == 1
    assert loader.stats()["failed"] == 1


def test_tar_shard_loader_streams_lazily(img_dir, tmp_path):
    """Regression: the decode pool must not drain the member generator
    eagerly (Executor.map held every shard's compressed bytes in memory
    before the first batch). With a later shard missing on disk, a lazy
    stream still yields the first shard's batches before failing."""
    import tarfile

    from selftoktokenizer_tpu.data.native import TarShardLoader

    sp = str(tmp_path / "first.tar")
    with tarfile.open(sp, "w") as tf:
        for p in img_dir:
            tf.add(p, arcname=os.path.basename(p))
    missing = str(tmp_path / "never-written.tar")
    it = iter(TarShardLoader([sp, missing], size=64, batch=2, n_threads=1))
    imgs, names = next(it)  # eager ingestion raised FileNotFoundError here
    assert imgs.shape[0] == 2
    with pytest.raises(FileNotFoundError):
        for _ in it:
            pass


def test_preprocess_pil_converts_non_rgb():
    """grayscale/RGBA inputs must come out [1,s,s,3] like the native decoder
    (JCS_RGB / png_set_gray_to_rgb) — the tar fallback path crashed on them."""
    from PIL import Image

    from selftoktokenizer_tpu.pipeline.preprocess import preprocess_pil

    for mode, shape in [("L", (64, 64)), ("RGBA", (64, 64))]:
        img = Image.new(mode, shape)
        out = preprocess_pil(img, 32)
        assert out.shape == (1, 32, 32, 3), mode


def test_native_loader_skips_all_failed_batches(tmp_path):
    """A worker slice whose decodes all fail pushes an empty batch from the
    C ring; the wrapper must skip it, not yield a [0,...] array."""
    import numpy as np
    from PIL import Image

    from selftoktokenizer_tpu.data.native import (
        NativeImageLoader, native_available)

    if not native_available():
        import pytest
        pytest.skip("native lib not built")
    paths = []
    for i in range(4):  # one full batch of garbage
        p = tmp_path / f"bad{i}.jpg"
        p.write_bytes(b"not an image")
        paths.append(str(p))
    for i in range(4):
        arr = np.random.default_rng(i).integers(0, 255, (40, 40, 3),
                                                dtype=np.uint8)
        p = tmp_path / f"good{i}.jpg"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    loader = NativeImageLoader(paths, size=32, batch=4, n_threads=1)
    seen = 0
    for imgs in loader:
        assert imgs.shape[0] > 0
        seen += imgs.shape[0]
    assert seen == 4
    assert loader.stats()["failed"] == 4
