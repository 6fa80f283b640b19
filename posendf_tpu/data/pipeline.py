"""Host-side training input pipeline.

Capability parity with the reference training reader
(``model/load_data.py:18-86``): each training example draws ``num_pts``
random (pose, distance-label) rows from one labeled .npz file (distance =
mean of the 5 kNN distances, ``load_data.py:53``) plus ``num_pts`` clean
"manifold" poses from one random raw-AMASS quaternion file; a step batches
``batch_size`` such draws; ``epoch()`` visits every labeled file exactly
once per epoch in a seeded permutation, dropping the last partial batch —
the reference's ``DataLoader(shuffle=True, drop_last=True)`` semantics.

``flip`` quirk (reference ``load_data.py:51-63``): upstream flips the noisy
poses, then assigns ``quat_flip(poses)`` — the SAME flipped noisy rows — as
``man_poses``; under flip the manifold branch never sees the AMASS file at
all. ``flip_mode="reference"`` (default, per the repo's quirk convention —
flip_* pretrained checkpoints bake this in) reproduces that;
``flip_mode="corrected"`` flips both branches properly.

TPU-native design: instead of 30 DataLoader worker processes feeding a
per-batch H2D copy, a small thread pool pre-assembles whole flat batches of
shape (batch_size * num_pts, ...) into pinned numpy buffers and a
double-buffered prefetcher overlaps host assembly with device compute;
arrays are device_put with a batch-sharded NamedSharding so each chip
receives only its slice.
"""

from __future__ import annotations

import collections
import glob
import os
import queue
import threading
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from posendf_tpu.data.splits import AMASS_SPLITS

__all__ = ["TrainingBatcher", "prefetch_to_device"]


def _flip_np(q: np.ndarray) -> np.ndarray:
    return np.where(q[..., :1] < 0, -q, q)


@dataclass
class _FileSets:
    labeled: List[str]
    manifold: List[str]


class TrainingBatcher:
    """Samples flat training batches from labeled + raw pose files.

    Args:
      data_dir: directory of labeled files ``<subset>/<seq>.npz`` with keys
        ``pose`` (N, 21, 4) and ``dist`` (N, K).
      amass_dir: directory of clean pose files ``<subset>/<seq>.npz`` with a
        ``pose`` (N, 21, 4) key (quaternions).
      split: which AMASS split's subsets to read (``train``/``vald``/``test``).
      batch_size: files per step (reference: 4).
      num_pts: rows per file per step (reference: 5000).
      flip: canonicalize quaternions to w >= 0.
      flip_mode: under flip, 'reference' feeds the flipped NOISY rows as
        man_poses (the upstream bug, load_data.py:63); 'corrected' flips
        the real manifold draws.
      seed: RNG seed; per-epoch reseeding is derived from it.
      file_glob: pattern under data_dir. Default None = the reference's
        ``*/*000.npz`` filter (only ``000``-suffixed labeled shards,
        ``model/load_data.py:28``); if that matches NOTHING the default
        falls back to ``*/*.npz`` with a warning (labeled files produced by
        this repo's own ``prepare-data`` keep their AMASS basenames). An
        explicit glob is used verbatim, no fallback.
      buffer_pool: native path only — rotate batch output buffers through a
        pool of this size instead of allocating ~20 MB fresh per batch
        (fresh large allocs fault in thousands of pages every batch;
        measured ~15-20% of assembly time at the 20k-pose reference batch).
        LIFETIME CONTRACT when > 0: a returned batch's arrays are
        OVERWRITTEN after `buffer_pool` further sample_batch calls — safe
        for streaming consumers that device_put each batch before pulling
        the next (``prefetch_to_device``'s worker does exactly that); unsafe
        for callers that collect host batches in a list. 0 (default) =
        fresh arrays every call.
    """

    def __init__(
        self,
        data_dir: str,
        amass_dir: str,
        split: str = "train",
        batch_size: int = 4,
        num_pts: int = 5000,
        flip: bool = False,
        flip_mode: str = "reference",
        seed: int = 0,
        file_glob: Optional[str] = None,
        subsets: Optional[Sequence[str]] = None,
        backend: str = "auto",
        native_threads: int = 4,
        buffer_pool: int = 0,
    ):
        subsets = list(subsets) if subsets is not None else AMASS_SPLITS[split]

        def _labeled(pattern: str) -> List[str]:
            return [
                f for f in sorted(glob.glob(os.path.join(data_dir, pattern)))
                if os.path.basename(os.path.dirname(f)) in subsets
            ]

        if file_glob is None:
            # reference default (model/load_data.py:28): only 000-suffixed
            # labeled shards; in a mixed directory the other shards are
            # deliberately ignored, exactly like upstream
            labeled = _labeled("*/*000.npz")
            if not labeled:
                import warnings

                labeled = _labeled("*/*.npz")
                if labeled:
                    warnings.warn(
                        "no */*000.npz labeled shards (the reference's "
                        "training-file filter) — falling back to */*.npz; "
                        "pass file_glob explicitly to silence",
                        stacklevel=2)
        else:
            labeled = _labeled(file_glob)
        manifold = [
            f for f in sorted(glob.glob(os.path.join(amass_dir, "*/*.npz")))
            if os.path.basename(os.path.dirname(f)) in subsets
        ]
        if not labeled:
            raise FileNotFoundError(f"no labeled files under {data_dir} for subsets {subsets}")
        if not manifold:
            raise FileNotFoundError(f"no manifold files under {amass_dir} for subsets {subsets}")
        self.files = _FileSets(labeled, manifold)
        self.batch_size = batch_size
        self.num_pts = num_pts
        self.flip = flip
        if flip_mode not in ("reference", "corrected"):
            raise ValueError(f"unknown flip_mode {flip_mode!r}")
        self.flip_mode = flip_mode
        self._seed = seed
        self._rng = np.random.default_rng(seed)
        # bounded LRU over decoded files — AMASS-scale datasets (~3000 files,
        # tens of MB each) would otherwise grow host RSS without limit
        self.max_cached_files = 32
        self._cache: "collections.OrderedDict[str, Dict[str, np.ndarray]]" = (
            collections.OrderedDict())
        self._cache_lock = threading.Lock()

        # native C++ loader (mmap'd npz + threaded gather); see data/native.py
        from posendf_tpu.data import native as _native

        self.native_threads = native_threads
        if backend == "native" or (backend == "auto" and _native.available()):
            if backend == "native" and not _native.available():
                if not _native.build():
                    raise RuntimeError("native backend requested but build failed")
            self._native = _native
            # bounded pool of open mmaps (one fd each) — LRU-evicted so long
            # runs over thousands of files never exhaust ulimit -n
            self.max_native_handles = 256
            self._native_handles: "collections.OrderedDict[str, _native.NativeNpz]" = (
                collections.OrderedDict())
            self._native_lock = threading.Lock()
            self.backend = "native"
        else:
            self._native = None
            self.backend = "numpy"
        self.buffer_pool = int(buffer_pool)
        self._buf_sets: Dict[tuple, list] = {}
        # rotation index PER (B, P) pool: a shared counter desyncs under
        # interleaved batch shapes and can hand back the buffer returned one
        # call earlier, violating the documented overwrite contract
        self._buf_idx: Dict[tuple, int] = {}

    def _native_open(self, path: str):
        # lock for dict consistency under concurrent sample_batch; evicted
        # handles are NOT closed here — another thread may be mid-gather on
        # one — they close via refcount/__del__ once every borrower is done
        with self._native_lock:
            h = self._native_handles.get(path)
            if h is None:
                h = self._native.NativeNpz(path)
                self._native_handles[path] = h
                while len(self._native_handles) > self.max_native_handles:
                    self._native_handles.popitem(last=False)
            else:
                self._native_handles.move_to_end(path)
            return h

    def __len__(self) -> int:
        """Steps per epoch (file-level epochs like the reference loader)."""
        return max(1, len(self.files.labeled) // self.batch_size)

    def _load(self, path: str, keys: Sequence[str]) -> Dict[str, np.ndarray]:
        with self._cache_lock:
            hit = self._cache.get(path)
            if hit is not None:
                self._cache.move_to_end(path)
                return hit
        with np.load(path) as z:
            data = {k: np.asarray(z[k]) for k in keys if k in z}
        with self._cache_lock:
            self._cache[path] = data
            self._cache.move_to_end(path)
            while len(self._cache) > self.max_cached_files:
                self._cache.popitem(last=False)
        return data

    def sample_batch(self, rng: Optional[np.random.Generator] = None,
                     lab_idx: Optional[np.ndarray] = None) -> Dict[str, np.ndarray]:
        """One flat training batch:
        pose (B*P, 21, 4) float32, dist (B*P,) float32, man_poses (B*P, 21, 4).

        Consumes exactly ONE draw from ``rng`` (everything inside derives
        from a child generator), so the (seed, epoch) batch stream is
        invariant to the backend in use — a mid-run native->numpy fallback
        does not desync later batches.
        """
        rng = rng or self._rng
        seed0 = int(rng.integers(0, 2 ** 62))
        inner = np.random.default_rng(seed0)
        lab_was_none = lab_idx is None
        if lab_was_none:
            lab_idx = inner.integers(0, len(self.files.labeled), self.batch_size)
        man_idx = inner.integers(0, len(self.files.manifold), self.batch_size)

        if self._native is not None:
            try:
                return self._sample_batch_native(inner, lab_idx, man_idx)
            except (OSError, RuntimeError) as e:
                import warnings

                warnings.warn(
                    f"native loader failed ({type(e).__name__}: {e}); falling "
                    "back to the numpy backend for the rest of the run",
                    stacklevel=2)
                with self._native_lock:
                    self._native_handles.clear()  # release mmaps/fds
                self._native = None  # e.g. compressed npz: fall back for good
                self.backend = "numpy"
                # re-seed the child from the SAME seed and replay the header
                # draws: the numpy loop below then sees exactly the stream a
                # never-native run would have — no second parent draw, no
                # desync of later batches (the documented contract above)
                inner = np.random.default_rng(seed0)
                if lab_was_none:
                    inner.integers(0, len(self.files.labeled), self.batch_size)
                inner.integers(0, len(self.files.manifold), self.batch_size)

        poses, dists, mans = [], [], []
        for li, mi in zip(lab_idx, man_idx):
            lab = self._load(self.files.labeled[li], ("pose", "dist"))
            rows = inner.integers(0, len(lab["pose"]), self.num_pts)
            p = lab["pose"][rows]
            d = lab["dist"][rows]
            if d.ndim > 1:
                d = d.mean(axis=1)  # mean of k nearest (load_data.py:53)
            if self.flip and self.flip_mode == "reference":
                # reference quirk (load_data.py:63): man_poses = the flipped
                # NOISY rows — skip the (discarded) manifold load entirely,
                # like the native path; no rng draw so the stream is
                # unchanged relative to the draws a consumer observes
                p = _flip_np(p)
                m = p
            else:
                man = self._load(self.files.manifold[mi], ("pose",))
                mrows = inner.integers(0, len(man["pose"]), self.num_pts)
                m = man["pose"][mrows]
                if self.flip:
                    p = _flip_np(p)
                    m = _flip_np(m)
            poses.append(p)
            dists.append(d)
            mans.append(m)
        return {
            "pose": np.concatenate(poses).astype(np.float32),
            "dist": np.concatenate(dists).astype(np.float32),
            "man_poses": np.concatenate(mans).astype(np.float32),
        }

    def _sample_batch_native(self, rng, lab_idx, man_idx) -> Dict[str, np.ndarray]:
        """C++ fast path: whole-batch gather into pre-sized buffers.

        Sized by ``len(lab_idx)``, not ``batch_size``: ``epoch()`` hands a
        SHORT final index slice when fewer labeled files than batch_size
        exist, and sizing by batch_size would return np.empty rows of
        uninitialized memory as training data (numpy path returns the short
        batch)."""
        B, P = len(lab_idx), self.num_pts
        pose, dist, man = self._batch_buffers(B, P)
        ref_quirk = self.flip and self.flip_mode == "reference"
        if self._native.supports_assemble_batch():
            # fused path: ONE native call assembles the whole batch (one
            # ctypes crossing + one thread fan-out instead of 2*B); row
            # draws are per-(file, item) seeded, so the result is
            # bit-identical to the per-file loop below (tested)
            seeds = [int(rng.integers(0, 2 ** 62)) for _ in range(B)]
            labs = [self._native_open(self.files.labeled[li])
                    for li in lab_idx]
            # man_idx is always batch_size long but lab_idx may be a SHORT
            # final epoch slice — truncate like the per-file loop's zip
            mans = (None if ref_quirk else
                    [self._native_open(self.files.manifold[mi])
                     for mi in man_idx[:B]])
            self._native.assemble_batch(
                labs, mans, seeds, P, self.flip, ref_quirk,
                pose.reshape(B * P, 84), dist, man.reshape(B * P, 84),
                threads=self.native_threads)
            return {"pose": pose, "dist": dist, "man_poses": man}
        # per-file fallback (an older .so via POSENDF_NATIVE_LIB)
        for b, (li, mi) in enumerate(zip(lab_idx, man_idx)):
            seed = int(rng.integers(0, 2 ** 62))
            h = self._native_open(self.files.labeled[li])
            p, d = h.sample_labeled(P, seed, flip=self.flip,
                                    threads=self.native_threads,
                                    poses_out=pose[b * P:(b + 1) * P].reshape(P, 84),
                                    dist_out=dist[b * P:(b + 1) * P])
            if ref_quirk:
                # reference quirk (load_data.py:63): man_poses = the flipped
                # noisy rows themselves
                man[b * P:(b + 1) * P] = pose[b * P:(b + 1) * P]
            else:
                hm = self._native_open(self.files.manifold[mi])
                # gather straight into the batch slice (an intermediate
                # array would add an alloc + a full extra copy per file)
                hm.sample_rows(
                    "pose", P, seed ^ 0xDEADBEEF, flip=self.flip,
                    threads=self.native_threads,
                    out=man[b * P:(b + 1) * P].reshape(P, 84))
        return {"pose": pose, "dist": dist, "man_poses": man}

    def _batch_buffers(self, B: int, P: int):
        """Output buffers for one native batch: fresh arrays (buffer_pool=0)
        or a rotating pool (see the constructor's lifetime contract)."""
        if self.buffer_pool <= 0:
            return (np.empty((B * P, 21, 4), np.float32),
                    np.empty((B * P,), np.float32),
                    np.empty((B * P, 21, 4), np.float32))
        key = (B, P)
        pool = self._buf_sets.setdefault(key, [])
        idx = self._buf_idx.get(key, 0)
        if len(pool) < self.buffer_pool:
            pool.append((np.empty((B * P, 21, 4), np.float32),
                         np.empty((B * P,), np.float32),
                         np.empty((B * P, 21, 4), np.float32)))
            bufs = pool[-1]
        else:
            bufs = pool[idx % len(pool)]
        self._buf_idx[key] = idx + 1
        return bufs

    def epoch(self, epoch_idx: int) -> Iterator[Dict[str, np.ndarray]]:
        """Deterministic per-epoch stream of len(self) batches (reproducible
        across process restarts: keyed on (seed, epoch) only).

        Labeled files are visited via a seeded PERMUTATION, every file
        exactly once per epoch with the last partial batch dropped — the
        reference's ``DataLoader(shuffle=True, drop_last=True)`` coverage
        guarantee (``load_data.py:76-85``); with-replacement draws would
        leave ~1/e of the files unseen each epoch."""
        rng = np.random.default_rng(np.random.SeedSequence([self._seed, epoch_idx]))
        perm = rng.permutation(len(self.files.labeled))
        for step in range(len(self)):
            lab_idx = perm[step * self.batch_size:(step + 1) * self.batch_size]
            yield self.sample_batch(rng, lab_idx=lab_idx)


def prefetch_to_device(iterator, sharding=None, depth: int = 2):
    """Double-buffered host->device prefetcher.

    Wraps a host batch iterator; assembles and device_puts ``depth`` batches
    ahead on a background thread so input never serializes with the train
    step (the TPU-side replacement for DataLoader worker pools).
    """
    import jax

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = object()
    failure = []
    cancel = threading.Event()  # set when the consumer abandons the generator

    def _put(item) -> bool:
        """put that gives up when the consumer cancelled (a plain blocking
        put would leave the thread stuck forever holding device batches if
        the generator is dropped mid-epoch, e.g. a failing train step)."""
        while not cancel.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for batch in iterator:
                if cancel.is_set():
                    return
                if sharding is not None:
                    batch = jax.tree_util.tree_map(
                        lambda x: jax.device_put(x, sharding), batch
                    )
                else:
                    batch = jax.tree_util.tree_map(jax.device_put, batch)
                if not _put(batch):
                    return
        except BaseException as e:  # propagate to the consumer, don't swallow
            failure.append(e)
        finally:
            _put(stop)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is stop:
                if failure:
                    raise failure[0]
                break
            yield item
    finally:
        cancel.set()
        while True:  # release any batches the worker already queued
            try:
                q.get_nowait()
            except queue.Empty:
                break
        t.join(timeout=5.0)
