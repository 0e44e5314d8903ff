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


def test_loader_counts_bad_files(img_dir, tmp_path):
    bad = str(tmp_path / "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"not an image at all")
    loader = NativeImageLoader([img_dir[0], bad], size=64, batch=2)
    total = sum(b.shape[0] for b in loader)
    assert total == 1
    assert loader.stats()["failed"] == 1
