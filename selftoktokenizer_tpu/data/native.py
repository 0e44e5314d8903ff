"""ctypes bindings for the native C++ image loader (native/dataloader.cc).

The native library does JPEG/PNG decode + shortest-side bilinear resize +
center crop + [-1,1] float32 NHWC normalize with a multithreaded prefetch
ring, keeping the TPU fed without Python in the image path. Falls back to
the PIL path (pipeline/preprocess.py) when the library isn't built.

Build: ``make -C native`` (g++, libjpeg, libpng).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_LIB_PATHS = [
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "libselftok_data.so"),
    "libselftok_data.so",
]


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    for p in _LIB_PATHS:
        try:
            lib = ctypes.CDLL(p)
        except OSError:
            continue
        # a stale prebuilt .so that predates a symbol must fall back to the
        # PIL path, not AttributeError at first use (ctypes resolves symbols
        # lazily on attribute access)
        try:
            for sym in ("stk_preprocess_file", "stk_preprocess_bytes",
                        "stk_loader_create", "stk_loader_next",
                        "stk_loader_destroy", "stk_loader_stats"):
                getattr(lib, sym)
        except AttributeError:
            continue
        lib.stk_preprocess_file.restype = ctypes.c_int
        lib.stk_preprocess_file.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
        lib.stk_preprocess_bytes.restype = ctypes.c_int
        lib.stk_preprocess_bytes.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.stk_loader_create.restype = ctypes.c_void_p
        lib.stk_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_long, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.stk_loader_next.restype = ctypes.c_int
        lib.stk_loader_next.argtypes = [ctypes.c_void_p,
                                        ctypes.POINTER(ctypes.c_float),
                                        ctypes.POINTER(ctypes.c_long)]
        lib.stk_loader_destroy.argtypes = [ctypes.c_void_p]
        lib.stk_loader_stats.restype = ctypes.c_long
        lib.stk_loader_stats.argtypes = [ctypes.c_void_p,
                                         ctypes.POINTER(ctypes.c_long)]
        _LIB = lib
        return lib
    return None


def native_available():
    return _load() is not None


def preprocess_file(path, size):
    """file -> [1, size, size, 3] float32 in [-1,1] via the native path;
    falls back to PIL."""
    lib = _load()
    if lib is None:
        from selftoktokenizer_tpu.pipeline.preprocess import load_image

        return load_image(path, size)
    out = np.empty((size, size, 3), np.float32)
    ok = lib.stk_preprocess_file(
        path.encode(), size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if not ok:
        raise IOError(f"native decode failed: {path}")
    return out[None]


def preprocess_bytes(data, size):
    """encoded image bytes -> [1, size, size, 3] float32 in [-1,1] via the
    native path; PIL fallback."""
    lib = _load()
    if lib is None:
        import io

        from PIL import Image

        from selftoktokenizer_tpu.pipeline.preprocess import preprocess_pil

        return preprocess_pil(Image.open(io.BytesIO(data)), size)
    out = np.empty((size, size, 3), np.float32)
    ok = lib.stk_preprocess_bytes(
        data, len(data), size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if not ok:
        raise IOError("native bytes decode failed")
    return out[None]


_IMG_EXT = (".jpg", ".jpeg", ".png")


def shuffle_shards(shards, seed, epoch=0):
    """Deterministic per-epoch shard permutation — webdataset's training
    data contract (shardshuffle with an epoch-reseeded rng). Multi-host
    callers permute the GLOBAL shard list with this, then split per host
    (parallel.distributed.process_slice), so every epoch deals each host a
    fresh random subset."""
    order = np.random.default_rng([int(seed), int(epoch)]).permutation(
        len(shards))
    return [shards[i] for i in order]


class TarShardLoader:
    """webdataset-style sharded-tar ingestion (the reference's trainer-side
    dataset format — requirements.txt pins webdataset).

    Shards are plain tar archives of images. Each shard streams
    SEQUENTIALLY (the whole point of the tar format: large sequential reads
    from blob storage instead of per-file round-trips); members decode
    through the native bytes path on a small thread pool and accumulate into
    [batch, size, size, 3] float32 [-1,1] batches. For multi-host training,
    split the SHARD list across hosts (parallel.distributed.process_slice on
    shards, not files) before constructing the loader.

    Training semantics (webdataset parity):

    * ``seed`` (+ ``epoch``): shuffles THIS loader's shard list
      deterministically (single-host; multi-host shuffles the global list
      first — see `shuffle_shards`) and seeds the sample shuffle buffer.
    * ``shuffle_buffer=B``: streaming sample shuffle — a B-slot buffer over
      the member stream, emitting a uniformly random slot per incoming
      member (webdataset's `.shuffle(B)`). Reads stay sequential; only the
      emission order randomizes. Deterministic given (seed, epoch).
    * ``skip_samples=N``: mid-epoch resume — drop the first N members of the
      (post-shuffle) stream WITHOUT decoding them, then continue. Because
      the stream is deterministic, a resumed loader continues exactly where
      a run that consumed N samples stopped. Skip counts raw members; a
      decode failure inside the skipped prefix shifts alignment by one (the
      same hazard webdataset's sample-count resume has — failures are
      corpus corruption, not steady state).

    yields (images, keys) with keys like 'shard-0000/member.jpg'; failed
    decodes are dropped and counted in .stats(). ``members_seen`` counts
    every streamed member (skipped + decoded + failed) — epoch-length
    accounting for resume bookkeeping.
    """

    def __init__(self, shards, size=256, batch=16, n_threads=4, seed=None,
                 epoch=0, shuffle_buffer=0, skip_samples=0,
                 shard_shuffle=True):
        self.shards = list(shards)
        # shard_shuffle=False: caller already permuted the (global) shard
        # list — seed then only drives the sample shuffle buffer
        if seed is not None and shard_shuffle:
            self.shards = shuffle_shards(self.shards, seed, epoch)
        self.size, self.batch = size, batch
        self.n_threads = n_threads
        self.seed, self.epoch = seed, epoch
        self.shuffle_buffer = shuffle_buffer
        self.skip_samples = skip_samples
        self.members_seen = 0
        self._decoded = 0
        self._failed = 0

    def stats(self):
        return {"decoded": self._decoded, "failed": self._failed}

    def _decode(self, item):
        name, data = item
        try:
            return name, preprocess_bytes(data, self.size)
        except Exception:
            return name, None

    def __iter__(self):
        import tarfile
        from concurrent.futures import ThreadPoolExecutor

        # per-iteration counters: re-iterating one instance (an epoch loop)
        # must not double-count — members_seen is the resume bookkeeping's
        # epoch length and stats() describes the LAST pass
        self.members_seen = 0
        self._decoded = 0
        self._failed = 0

        def members():
            for shard in self.shards:
                base = os.path.splitext(os.path.basename(shard))[0]
                with tarfile.open(shard, "r|*") as tf:  # streaming mode
                    for m in tf:
                        if not m.isfile() or \
                                not m.name.lower().endswith(_IMG_EXT):
                            continue
                        f = tf.extractfile(m)
                        if f is None:
                            continue
                        self.members_seen += 1
                        yield f"{base}/{m.name}", f.read()

        def shuffled():
            # streaming sample shuffle over RAW members (pre-decode, so the
            # resume skip below never pays decode for dropped samples);
            # buffer holds compressed bytes — B * ~avg-image-size of RAM
            if self.shuffle_buffer <= 0:
                yield from members()
                return
            rng = np.random.default_rng(
                [int(self.seed or 0), int(self.epoch), 1])
            buf = []
            for item in members():
                if len(buf) < self.shuffle_buffer:
                    buf.append(item)
                    continue
                j = int(rng.integers(len(buf)))
                out, buf[j] = buf[j], item
                yield out
            while buf:  # drain in random order
                j = int(rng.integers(len(buf)))
                buf[j], buf[-1] = buf[-1], buf[j]
                yield buf.pop()

        def stream():
            it = shuffled()
            for _ in range(self.skip_samples):  # mid-epoch resume: no decode
                if next(it, None) is None:
                    return
            yield from it

        # bounded sliding window of decode futures: Executor.map would drain
        # the stream eagerly (every shard's compressed bytes in memory at
        # once); capping in-flight work keeps the stream truly sequential
        def decoded():
            from collections import deque
            window = max(2 * self.n_threads, self.batch)
            pending = deque()
            with ThreadPoolExecutor(self.n_threads) as pool:
                for item in stream():
                    pending.append(pool.submit(self._decode, item))
                    if len(pending) >= window:
                        yield pending.popleft().result()
                while pending:
                    yield pending.popleft().result()

        imgs, keys = [], []
        for name, arr in decoded():
            if arr is None:
                self._failed += 1
                continue
            self._decoded += 1
            imgs.append(arr)
            keys.append(name)
            if len(imgs) == self.batch:
                yield np.concatenate(imgs), keys
                imgs, keys = [], []
        if imgs:
            yield np.concatenate(imgs), keys


class NativeImageLoader:
    """Prefetching batch iterator over image paths.

    yields float32 [batch, size, size, 3] arrays (short batches possible at
    the tail; failed decodes are dropped and counted in .stats()).

    Batches complete in WORKER order, not path order — use
    ``next_with_indices()`` (or ``.last_indices`` after ``__next__``) for any
    token <-> path association.
    """

    def __init__(self, paths, size=256, batch=16, n_threads=4, queue_cap=4):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "native loader not built — run `make -C native`")
        self._lib = lib
        self.size, self.batch = size, batch
        self._cpaths = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        self._h = lib.stk_loader_create(self._cpaths, len(paths), size, batch,
                                        n_threads, queue_cap)
        self._buf = np.empty((batch, size, size, 3), np.float32)
        self._idx = np.empty((batch,), np.int64)
        self.last_indices = None

    def __iter__(self):
        return self

    def __next__(self):
        imgs, idx = self.next_with_indices()
        return imgs

    def next_with_indices(self):
        """-> (images [n,size,size,3], source path indices [n]). Raises
        StopIteration when exhausted."""
        while True:
            n = self._lib.stk_loader_next(
                self._h,
                self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self._idx.ctypes.data_as(ctypes.POINTER(ctypes.c_long)))
            if n < 0:
                raise StopIteration
            if n == 0:
                # a worker slice whose decodes ALL failed pushes an empty
                # batch (dataloader.cc worker()); skip it rather than yield
                # a [0, ...] array mid-stream
                continue
            self.last_indices = self._idx[:n].copy()
            return self._buf[:n].copy(), self.last_indices

    def stats(self):
        failed = ctypes.c_long(0)
        decoded = self._lib.stk_loader_stats(self._h, ctypes.byref(failed))
        return {"decoded": int(decoded), "failed": int(failed.value)}

    def close(self):
        if self._h:
            self._lib.stk_loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
