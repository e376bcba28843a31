"""Training minibatch sampler (host side) with device prefetch.

Equivalent of the reference's ``get_data_minibatch`` (reference: src/lofar_tools.py:51-211):
randomly pick one (file, SAP), randomly pick ``batch_size`` baselines, decode int8 x scale
into real channels, patchify (baseline-major — see lshm_tpu/data/patches.py), clamp, global
z-normalize, optionally double the batch with an augmentation transform interleaved per
baseline.  A background thread keeps a bounded queue of device-resident minibatches so the
TPU never waits on h5py.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Callable, Iterator

import numpy as np

from lshm_tpu.config import DataConfig
from lshm_tpu.data.h5io import (
    _POLS_4CH,
    _POLS_8CH,
    compute_uv,
    read_baseline_channels,
    read_baseline_raw,
    read_metadata,
)
from lshm_tpu.data.patches import patchify


@dataclass
class Minibatch:
    """One training minibatch.

    x:  [batch_size * patchx * patchy (*2 if augmented), ps, ps, C] float32, baseline-major
    uv: matching [N, 2] float32 (u, v) in wavelengths, constant within a baseline group
    patchx, patchy: patch grid dims; patches_per_baseline = patchx * patchy (*2 if augmented)
    """

    x: np.ndarray
    uv: np.ndarray
    patchx: int
    patchy: int
    num_baselines: int

    @property
    def patches_per_baseline(self) -> int:
        return self.x.shape[0] // self.num_baselines


@dataclass
class RawMinibatch:
    """One minibatch in raw H5 form (pre-decode) for the device-decode path.

    vis:    [B, T, F, npol, 2] int8 raw visibilities
    scales: [B, F, npol] float32 per-(baseline, freq, pol) scale factors
    uv:     [B, 2] float32 (u, v) per baseline (zeros when uvdist is off)
    flip_flags: [B, 2] bool per-baseline (time, freq) flip decisions (augment path)
    """

    vis: np.ndarray
    scales: np.ndarray
    uv: np.ndarray
    flip_flags: np.ndarray
    patchx: int
    patchy: int
    num_baselines: int


def default_augment(rng: np.random.Generator, patches: np.ndarray) -> np.ndarray:
    """Default augmentation: random time/freq flips (the reference leaves the torchvision
    transform unspecified / None in the shipped path; reference: src/lofar_tools.py:196-203)."""
    out = patches
    if rng.random() < 0.5:
        out = out[:, ::-1, :, :]
    if rng.random() < 0.5:
        out = out[:, :, ::-1, :]
    return np.ascontiguousarray(out)


class _SignatureRng:
    """Forwarding proxy around ``np.random.Generator`` that records the call signature
    (method name + stream-consumption-relevant args) of every draw.

    ``skip()`` replays the rng stream without data, so an ``augment_fn`` whose rng
    consumption depends on the *data* would silently desynchronize exact resume.  The
    sampler records the canonical signature once and checks every subsequent call
    against it — a mismatch raises instead of corrupting the stream."""

    def __init__(self, rng: np.random.Generator):
        self._rng = rng
        self.calls: list = []

    @staticmethod
    def _norm(v):
        # stream consumption is determined by sizes/shapes, not array contents
        if isinstance(v, np.ndarray):
            return ("arr", v.shape)
        if isinstance(v, (int, float, bool, str, bytes, tuple, type(None))):
            return v
        return ("obj", type(v).__name__)

    def __getattr__(self, name):
        attr = getattr(self._rng, name)
        if not callable(attr):
            return attr

        def wrapped(*a, **k):
            self.calls.append(
                (name, tuple(self._norm(v) for v in a),
                 tuple(sorted((kk, self._norm(vv)) for kk, vv in k.items())))
            )
            return attr(*a, **k)

        return wrapped


class MinibatchSampler:
    """Random (file, SAP, baselines) sampler producing ``Minibatch`` objects."""

    def __init__(
        self,
        file_list: list[str],
        sap_list: list[str],
        cfg: DataConfig,
        seed: int = 0,
        augment_fn: Callable[[np.random.Generator, np.ndarray], np.ndarray] | None = None,
        use_native: bool | None = None,
        process_index: int | None = None,
    ):
        """``process_index``: multi-host data parallelism — each host folds its process
        id into the sampling stream so hosts draw disjoint random minibatches (the
        per-host rng-split sampler of SURVEY.md §5).  Defaults to jax.process_index()
        when more than one process is present."""
        assert len(file_list) == len(sap_list) and len(file_list) > 0
        self.file_list = file_list
        self.sap_list = sap_list
        self.cfg = cfg
        if process_index is None:
            try:
                import jax

                process_index = jax.process_index() if jax.process_count() > 1 else 0
            except Exception:
                process_index = 0
        self._seed = seed
        self._process_index = process_index
        self.rng = np.random.default_rng([seed, process_index])
        self.augment_fn = augment_fn or default_augment
        # cache metadata so baseline sampling doesn't reopen files
        self._meta = [read_metadata(f, s) for f, s in zip(file_list, sap_list)]
        # native fused decode (lshm_tpu/native) when built; numpy fallback otherwise
        if use_native is None:
            from lshm_tpu import native

            self.use_native = native.available()
        else:
            self.use_native = use_native
        # skip()-replay contract: the augment fn must consume the rng identically
        # for every input (VERDICT r3 #6).  Probe it on two different datasets with
        # a throwaway rng; data-dependent consumption fails HERE, not mid-resume.
        self._augment_sig: list | None = None
        if cfg.augment:
            probe_rng = np.random.default_rng(0)
            shape = (2, 8, 8, cfg.num_channels)
            for probe in (probe_rng.normal(size=shape).astype(np.float32),
                          np.zeros(shape, np.float32)):
                proxy = _SignatureRng(np.random.default_rng(1))
                self.augment_fn(proxy, probe)
                self._check_augment_sig(proxy.calls, where="construction probe")

    def _check_augment_sig(self, calls: list, where: str) -> None:
        if self._augment_sig is None:
            self._augment_sig = calls
        elif calls != self._augment_sig:
            raise RuntimeError(
                "augment_fn's rng consumption is data-dependent: observed draw "
                f"signature {calls!r} at {where} differs from the canonical "
                f"{self._augment_sig!r}.  skip()-based exact resume replays the rng "
                "stream without data, so such a transform would silently desync the "
                "stream — make the fn draw a fixed, data-independent sequence "
                "(draw first, then decide what to do with the values)."
            )

    def reseed(self, epoch: int) -> None:
        """Deterministic per-epoch stream: resuming at an epoch boundary reproduces the
        exact minibatch sequence of an uninterrupted run."""
        self.rng = np.random.default_rng([self._seed, self._process_index, epoch])

    def skip(self, n: int) -> None:
        """Advance the stream past ``n`` minibatches WITHOUT any H5 I/O, by replaying
        exactly the rng draws ``sample()`` would make.  ``reseed(epoch); skip(k)``
        positions the stream at iteration ``k`` of that epoch — the mid-epoch exact
        resume path (the reference has no resume at all; its optimizer state isn't even
        saved, src/kharmonic_lofar.py:210-222)."""
        dummy = np.zeros((1, 1, 1, 1), dtype=np.float32)
        for _ in range(n):
            idx = int(self.rng.integers(0, len(self.file_list)))
            nbase = self._meta[idx][0]
            self.rng.integers(0, nbase, self.cfg.batch_size)
            if self.cfg.augment:
                # augment_fn draws from rng per baseline group; replay on a dummy
                # patch group.  Valid only for fns whose rng use is data-independent
                # (like the default flip augmentation) — which the signature check
                # enforces, here and at every real call.
                for _ in range(self.cfg.batch_size):
                    proxy = _SignatureRng(self.rng)
                    self.augment_fn(proxy, dummy)
                    self._check_augment_sig(proxy.calls, where="skip() replay")

    def sample(self) -> Minibatch:
        cfg = self.cfg
        idx = int(self.rng.integers(0, len(self.file_list)))
        filename, sap = self.file_list[idx], self.sap_list[idx]
        nbase = self._meta[idx][0]
        baseline_ids = self.rng.integers(0, nbase, cfg.batch_size)

        if self.use_native:
            from lshm_tpu import native

            vis, scales = read_baseline_raw(filename, sap, baseline_ids)
            pols = _POLS_4CH if cfg.num_channels == 4 else _POLS_8CH
            patches, (px, py) = native.decode_patchify(
                vis, scales, pols, cfg.patch_size, cfg.clamp, normalize=cfg.normalize
            )
        else:
            x = read_baseline_channels(
                filename, sap, baseline_ids, cfg.num_channels, cfg.patch_size
            )
            patches, (px, py) = patchify(x, cfg.patch_size)
            patches = np.clip(patches, -cfg.clamp, cfg.clamp)
            if cfg.normalize:
                std = patches.std()
                patches = (patches - patches.mean()) / (std if std > 0 else 1.0)

        if cfg.uvdist:
            uv = compute_uv(filename, sap, baseline_ids)        # [B, 2]
        else:
            uv = np.zeros((cfg.batch_size, 2), dtype=np.float32)
        ppb = px * py
        uv_full = np.repeat(uv, ppb, axis=0)                    # baseline-major

        if cfg.augment:
            # interleave original and transformed patches per baseline
            grouped = patches.reshape(cfg.batch_size, ppb, *patches.shape[1:])
            pieces = []
            for b in range(cfg.batch_size):
                pieces.append(grouped[b])
                proxy = _SignatureRng(self.rng)
                pieces.append(self.augment_fn(proxy, grouped[b]))
                self._check_augment_sig(proxy.calls, where="sample()")
            patches = np.concatenate(pieces, axis=0)
            uv_full = np.repeat(uv, 2 * ppb, axis=0)

        return Minibatch(
            x=patches.astype(np.float32),
            uv=uv_full.astype(np.float32),
            patchx=px,
            patchy=py,
            num_baselines=cfg.batch_size,
        )

    @property
    def supports_device_decode(self) -> bool:
        """The raw path reproduces augmentation on device only for the default
        time/freq flip transform (its rng decisions travel as flags); a custom
        ``augment_fn`` must run on host-decoded patches."""
        return (not self.cfg.augment) or self.augment_fn is default_augment

    def sample_raw(self) -> RawMinibatch:
        """``sample()`` without the decode: raw int8 vis + f32 scales + uv (+
        per-baseline flip flags), for on-device decode+patchify+augment
        (lshm_tpu/data/device_decode.py::device_decode_train).

        Draws the EXACT rng sequence of ``sample()`` — file pick, baseline pick,
        and (augmenting) two uniforms per baseline, the same two ``rng.random()``
        calls ``default_augment`` makes — so checkpoints, ``skip()`` replay and
        mid-epoch exact resume are interchangeable between the host-decode and
        device-decode pipelines."""
        cfg = self.cfg
        if not self.supports_device_decode:
            raise RuntimeError(
                "sample_raw: custom augment_fn cannot be replayed on device; "
                "use the host-decode path (data.device_decode=False)"
            )
        idx = int(self.rng.integers(0, len(self.file_list)))
        filename, sap = self.file_list[idx], self.sap_list[idx]
        nbase, ntime, nfreq = self._meta[idx][:3]
        baseline_ids = self.rng.integers(0, nbase, cfg.batch_size)
        vis, scales = read_baseline_raw(filename, sap, baseline_ids)
        if cfg.uvdist:
            uv = compute_uv(filename, sap, baseline_ids)
        else:
            uv = np.zeros((cfg.batch_size, 2), dtype=np.float32)
        if cfg.augment:
            flags = np.empty((cfg.batch_size, 2), dtype=bool)
            for b in range(cfg.batch_size):
                flags[b, 0] = self.rng.random() < 0.5
                flags[b, 1] = self.rng.random() < 0.5
        else:
            flags = np.zeros((cfg.batch_size, 2), dtype=bool)
        from lshm_tpu.data.patches import patch_grid_shape

        px, py = patch_grid_shape(
            max(ntime, cfg.patch_size), max(nfreq, cfg.patch_size), cfg.patch_size
        )
        return RawMinibatch(
            vis=vis, scales=scales, uv=uv.astype(np.float32), flip_flags=flags,
            patchx=px, patchy=py, num_baselines=cfg.batch_size,
        )

    def __iter__(self) -> Iterator[Minibatch]:
        while True:
            yield self.sample()


class PrefetchIterator:
    """Background-thread prefetcher: samples on host, device_puts, and keeps a bounded
    queue so device steps overlap with h5py reads.  ``close()`` (or exhausting the
    consumer with the context manager) reliably stops the producer — puts use timeouts
    so the thread never blocks forever on a full queue after the consumer leaves."""

    def __init__(self, sampler: MinibatchSampler, size: int = 2,
                 device_put: Callable | None = None):
        import jax

        self._put = device_put or jax.device_put
        self._q: queue.Queue = queue.Queue(maxsize=max(size, 1))
        self._stop = threading.Event()
        self._sampler = sampler
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    def _producer(self):
        while not self._stop.is_set():
            mb = self._sampler.sample()
            item = Minibatch(
                x=self._put(mb.x), uv=self._put(mb.uv),
                patchx=mb.patchx, patchy=mb.patchy, num_baselines=mb.num_baselines,
            )
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=0.1)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator[Minibatch]:
        return self

    def __next__(self) -> Minibatch:
        return self._q.get()

    def close(self):
        self._stop.set()
        try:  # drain so a blocked put unblocks and device buffers free promptly
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=2.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class DeviceDecodePrefetcher:
    """Prefetcher that ships RAW int8 bytes and decodes on device.

    Same interface as ``PrefetchIterator`` (yields ``Minibatch`` with
    device-resident ``x``/``uv``), but the host->device transfer carries the raw
    int8 visibilities + f32 scales (+ flip flags) instead of decoded float32
    patch batches — ~8-22x fewer bytes (44x with augmentation), which is the
    measured end-to-end bottleneck of the training loop on link-constrained
    attachments (README round 5; eval got 4.4x from the same move).  One jitted
    program (device_decode_train) then does decode+patchify+clamp+norm+augment
    in HBM; it recompiles only per distinct raw (B, T, F) shape, and the train
    step itself sees the exact same [N, ps, ps, C] it always did."""

    def __init__(self, sampler: MinibatchSampler, size: int = 2,
                 device_put: Callable | None = None):
        import jax

        from lshm_tpu.data.device_decode import device_decode_train

        cfg = sampler.cfg
        self._put = device_put or jax.device_put
        self._decode = lambda vis, scales, flags: device_decode_train(
            vis, scales, flags,
            num_channels=cfg.num_channels, patch_size=cfg.patch_size,
            clamp=cfg.clamp, normalize=cfg.normalize, augment=cfg.augment,
        )
        self._q: queue.Queue = queue.Queue(maxsize=max(size, 1))
        self._stop = threading.Event()
        self._sampler = sampler
        self._err: BaseException | None = None
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    def _producer(self):
        cfg = self._sampler.cfg
        while not self._stop.is_set():
            try:
                raw = self._sampler.sample_raw()
                x = self._decode(self._put(raw.vis), self._put(raw.scales),
                                 self._put(raw.flip_flags))
                ppb = raw.patchx * raw.patchy * (2 if cfg.augment else 1)
                uv = self._put(np.repeat(raw.uv, ppb, axis=0))
            except BaseException as e:   # surface in the consumer, don't die silently
                self._err = e
                self._stop.set()
                return
            item = Minibatch(x=x, uv=uv, patchx=raw.patchx, patchy=raw.patchy,
                             num_baselines=raw.num_baselines)
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=0.1)
                    break
                except queue.Full:
                    continue

    def __iter__(self) -> Iterator[Minibatch]:
        return self

    def __next__(self) -> Minibatch:
        while True:
            try:
                return self._q.get(timeout=0.1)
            except queue.Empty:
                if self._err is not None:
                    raise RuntimeError("device-decode prefetch failed") from self._err

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=2.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def prefetch_to_device(
    sampler: MinibatchSampler, size: int = 2, device_put: Callable | None = None
) -> PrefetchIterator:
    return PrefetchIterator(sampler, size, device_put)
