"""Device-feeding pipeline: bucketed padding, batching, background prefetch.

TPU-first replacement for the reference's torch DataLoader + per-bag `.cuda()`
copies (ref runner/base_handler.py:239-263, vlsa_handler.py:205-206): whole
mini-batches of bags are padded to a shared bucket length (powers of two, so
the jitted step compiles once per bucket, not once per bag size) and loaded by
a background thread that overlaps disk reads with device compute.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np


def bucket_length(n: int, min_bucket: int = 256, max_bucket: Optional[int] = None) -> int:
    """Next power-of-two bucket >= n (bounded below/above)."""
    b = min_bucket
    while b < n:
        b *= 2
    if max_bucket is not None:
        b = min(b, max_bucket)
    return b


class BagOverflowError(ValueError):
    """A bag holds more patches than the padding bucket allows."""


def quantize_feats_int8(feats: np.ndarray):
    """Per-patch symmetric int8 quantization of `[.., N, D]` features.

    Returns (q int8, scale f32 [.., N]) with feats ~= q * scale[..., None].
    Zero rows (padding) get scale 0.  The coattn kernels consume this form
    directly — normalised attention logits are invariant to the per-patch
    scale, so only the PV accumulation pays for dequantization (ops/coattn).
    """
    absmax = np.abs(feats).max(axis=-1)
    scale = (absmax / 127.0).astype(np.float32)
    safe = np.where(scale > 0, scale, 1.0)
    q = np.clip(np.rint(feats / safe[..., None]), -127, 127).astype(np.int8)
    return q, scale


def feats_inv_norms(q: np.ndarray) -> np.ndarray:
    """Per-patch 1/l2norm of int8-quantized features `[.., N, D]` -> f32
    `[.., N]` (0 for all-zero padding rows).

    The normalised attention logits need 1/||x_int|| (scale-free); computing
    it once on the host removes the kernels' only O(N*D) VPU reduction
    (ops/coattn.py int8 path)."""
    sq = np.einsum("...nd,...nd->...n", q.astype(np.float32),
                   q.astype(np.float32))
    with np.errstate(divide="ignore"):
        inv = np.where(sq > 0, 1.0 / np.sqrt(sq), 0.0)
    return inv.astype(np.float32)


def _handle_overflow(n: int, target_n: int, overflow: str) -> None:
    if overflow == "error":
        raise BagOverflowError(
            f"bag of {n} patches exceeds the {target_n}-patch bucket; the "
            f"reference uses every patch (ref dataset/PatchWSI.py:205-215). "
            f"Raise `fixed_bucket`/`max_bucket`, or set bag_overflow: "
            f"'warn'/'truncate' to intentionally cap bags.")
    if overflow == "warn":
        print(f"[BagBatcher] WARNING: bag of {n} patches truncated to "
              f"{target_n} ({n - target_n} patches dropped)")
    elif overflow != "truncate":
        raise ValueError(f"invalid overflow policy {overflow!r}")


def pad_bag(feats: np.ndarray, target_n: int, overflow: str = "error"):
    """Pad a `[N, D]` bag to `[target_n, D]` + boolean mask `[target_n]`.

    Bags longer than `target_n` follow the `overflow` policy: 'error'
    (default — the reference never discards patches), 'warn' (truncate
    loudly), or 'truncate' (silent, for callers that already accounted)."""
    n, d = feats.shape
    if n >= target_n:
        if n > target_n:
            _handle_overflow(n, target_n, overflow)
        return feats[:target_n], np.ones(target_n, np.bool_)
    out = np.zeros((target_n, d), feats.dtype)
    out[:n] = feats
    mask = np.zeros(target_n, np.bool_)
    mask[:n] = True
    return out, mask


class BagBatcher:
    """Batch a SurvBagDataset into padded, masked numpy batches.

    Yields dicts with:
      feats [B, N, D] float32, mask [B, N] bool, t [B] f32, e [B] f32,
      idx [B] i32 (dataset indices), valid [B] bool (False for tail padding).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, min_bucket: int = 256,
                 max_bucket: Optional[int] = None, drop_last: bool = False,
                 prefetch: int = 2, fixed_bucket: Optional[int] = None,
                 feats_dtype: str = "float32", overflow: str = "error",
                 num_shards: int = 1, shard_index: int = 0,
                 precompute_inv: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.min_bucket = min_bucket
        self.max_bucket = max_bucket
        self.drop_last = drop_last
        self.prefetch = prefetch
        # fixed_bucket pads every batch to ONE length: a single XLA program
        # per step function (recommended on hardware — compiles are expensive)
        self.fixed_bucket = fixed_bucket
        # bf16 feature storage halves HBM traffic of the coattn kernels
        self.feats_dtype = feats_dtype
        # policy when a bag exceeds the bucket: 'error' (default — the
        # reference never drops patches), 'warn', or 'truncate'
        self.overflow = overflow
        # per-patch 1/l2norm rows for the fused kernels (one host pass per
        # batch, overlapped with device compute by the prefetch thread)
        self.precompute_inv = precompute_inv
        self.truncated_bags = 0
        self.truncated_patches = 0
        # multi-host data loading: this process materialises only its
        # contiguous 1/num_shards slice of every global batch (the global
        # order stays identical across hosts — same seed, same permutation);
        # parallel.multihost.make_global_batch assembles the jax.Arrays
        assert batch_size % num_shards == 0, \
            f"batch_size {batch_size} not divisible by num_shards {num_shards}"
        if num_shards > 1:
            # hosts never exchange bag sizes, so dynamic bucketing would
            # produce divergent global shapes -> require one fixed bucket
            assert fixed_bucket is not None, \
                "multi-host loading (num_shards > 1) requires fixed_bucket"
        self.num_shards = num_shards
        self.shard_index = shard_index
        self._local_bs = batch_size // num_shards
        self._epoch = 0

    def _cast_feats(self, batch: dict) -> None:
        """Apply the configured feature storage dtype in place.

        'bfloat16' halves, 'int8' quarters the HBM stream of the coattn
        kernels vs f32 (int8 adds a per-patch `feats_scale` f32 row; see
        quantize_feats_int8).  int8 also ships `feats_inv` = 1/||x_int||
        so the kernels skip their only O(N*D) VPU reduction — measured
        3.70 -> 2.63 ms on the flagship fwd+bwd (bf16 does NOT ship it:
        that kernel is HBM-DMA-bound and the reduction is fully
        overlapped, docs/PERF.md)."""
        if self.feats_dtype == "float32":
            return
        if self.feats_dtype == "int8":
            batch["feats"], batch["feats_scale"] = quantize_feats_int8(batch["feats"])
            if self.precompute_inv:
                batch["feats_inv"] = feats_inv_norms(batch["feats"])
            return
        import ml_dtypes  # numpy bfloat16 support
        batch["feats"] = batch["feats"].astype(
            ml_dtypes.bfloat16 if self.feats_dtype == "bfloat16" else self.feats_dtype)

    def _count_overflow(self, n: int, target_n: int) -> None:
        if n > target_n:
            _handle_overflow(n, target_n, self.overflow)
            self.truncated_bags += 1
            self.truncated_patches += n - target_n

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _order(self):
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            return rng.permutation(n)
        return np.arange(n)

    def _make_batch(self, indices: np.ndarray) -> dict:
        if len(indices) == 0:
            # this host's slice of a short tail batch: all-padding rows so
            # every process still joins the step's collectives
            n = self.fixed_bucket or self.min_bucket
            d = self.dataset[0][1][0].shape[1]
            batch = {"feats": np.zeros((self._local_bs, n, d), np.float32),
                     "mask": np.zeros((self._local_bs, n), np.bool_),
                     "t": np.zeros(self._local_bs, np.float32),
                     "e": np.zeros(self._local_bs, np.float32),
                     "idx": np.full(self._local_bs, -1, np.int32),
                     "valid": np.zeros(self._local_bs, np.bool_)}
            self._cast_feats(batch)
            return batch
        native = self._try_native_batch(indices)
        if native is not None:
            if "feats_scale" not in native:
                # q8 native batches arrive pre-quantized with sidecars;
                # re-quantizing int8 data would destroy the scales
                self._cast_feats(native)
            return native
        items = [self.dataset[int(i)] for i in indices]
        feats_list = [it[1][0] for it in items]
        # cluster mode: aux array holds per-patch cluster ids (ref
        # dataset/PatchWSI.py:217-229); graph mode: aux is edge_index [2, E]
        aux0 = items[0][1][1]
        has_cluster = aux0.ndim == 1 and aux0.shape == feats_list[0].shape[:1]
        has_graph = aux0.ndim == 2 and aux0.shape[0] == 2
        labels = np.stack([it[2] for it in items])
        max_n = max(f.shape[0] for f in feats_list)
        if self.fixed_bucket is not None:
            target_n = self.fixed_bucket
        else:
            target_n = bucket_length(max_n, self.min_bucket, self.max_bucket)
        B = self._local_bs
        D = feats_list[0].shape[1]
        from .io import QuantizedFeats
        quantized = isinstance(feats_list[0], QuantizedFeats)
        if quantized and self.feats_dtype != "int8":
            # pre-quantized store but a different compute dtype requested
            feats_list = [f.dequantize() for f in feats_list]
            quantized = False
        feats = np.zeros((B, target_n, D), np.int8 if quantized else np.float32)
        if quantized:
            fscale = np.zeros((B, target_n), np.float32)
            finv = np.zeros((B, target_n), np.float32)
        mask = np.zeros((B, target_n), np.bool_)
        t = np.zeros(B, np.float32)
        e = np.zeros(B, np.float32)
        idx = np.full(B, -1, np.int32)
        valid = np.zeros(B, np.bool_)
        cluster = np.zeros((B, target_n), np.int32) if has_cluster else None
        for j, (f, it) in enumerate(zip(feats_list, items)):
            self._count_overflow(f.shape[0], target_n)
            if quantized:
                # sidecars pad with zeros alongside the int8 values — no
                # per-epoch host quantization or norm pass
                n = min(f.shape[0], target_n)
                feats[j, :n] = f.q[:n]
                fscale[j, :n] = f.scale[:n]
                finv[j, :n] = f.inv[:n]
                mask[j, :n] = True
            else:
                feats[j], mask[j] = pad_bag(f, target_n, overflow="truncate")
            if has_cluster:
                cid = np.asarray(it[1][1], np.int32)
                n = min(len(cid), target_n)
                cluster[j, :n] = cid[:n]
            t[j], e[j] = labels[j, 0], labels[j, 1]
            idx[j] = int(indices[j])
            valid[j] = True
        batch = {"feats": feats, "mask": mask, "t": t, "e": e, "idx": idx, "valid": valid}
        if quantized:
            batch["feats_scale"] = fscale
            # honor precompute_inv even though the store ships `inv`: the
            # batch pytree structure must be identical to _cast_feats's
            # (all-padding tail batches on other hosts go through that path,
            # and a structure mismatch would desync the jitted step's
            # collectives across hosts)
            if self.precompute_inv:
                batch["feats_inv"] = finv
        else:
            self._cast_feats(batch)
        if has_cluster:
            batch["cluster_id"] = cluster
        if has_graph:
            max_e = max(1, max(it[1][1].shape[1] for it in items))
            ei = np.zeros((B, 2, max_e), np.int32)
            ev = np.zeros((B, max_e), np.bool_)
            for j, it in enumerate(items):
                e_j = it[1][1]
                ei[j, :, :e_j.shape[1]] = e_j
                ev[j, :e_j.shape[1]] = True
            batch["edge_index"] = ei
            batch["edge_valid"] = ev
        return batch

    def _try_native_batch(self, indices):
        """Native C++ threaded assembly for .npy (f32) and .q8npz (int8 +
        sidecars) feature stores."""
        ds = self.dataset
        if not hasattr(ds, "bag_paths"):
            return None
        groups = [ds.bag_paths(int(i)) for i in indices]
        # empty groups (e.g. a patient whose slide files are all missing)
        # fall back to the numpy path, which produces the diagnostic
        if any(not g for g in groups):
            return None
        q8 = groups[0][0].endswith(".q8npz")
        if q8 and self.feats_dtype != "int8":
            # a different compute dtype wants dequantized features; the
            # numpy path handles that conversion
            return None
        try:
            from .native_loader import (
                assemble_batch, assemble_q8_batch, native_available,
                read_npy_info, read_q8_info)
            if not native_available():
                return None
            read_info = read_q8_info if q8 else read_npy_info
            sizes = None
            if self.fixed_bucket is None or self.overflow != "truncate":
                sizes, dim = [], None
                for g in groups:
                    n = 0
                    for path in g:
                        r, c = read_info(path)
                        n += r
                        dim = c
                    sizes.append(n)
            if self.fixed_bucket is not None:
                target_n = self.fixed_bucket
                dim = read_info(groups[0][0])[1]
            else:
                target_n = bucket_length(max(sizes), self.min_bucket, self.max_bucket)
            if sizes is not None:
                for n in sizes:
                    self._count_overflow(n, target_n)
            B = self._local_bs
            if q8:
                q_n, scale_n, inv_n, mask_n, lens = assemble_q8_batch(
                    groups, target_n, dim)
                feats = np.zeros((B, target_n, dim), np.int8)
                fscale = np.zeros((B, target_n), np.float32)
                finv = np.zeros((B, target_n), np.float32)
                mask = np.zeros((B, target_n), np.bool_)
                feats[:len(groups)] = q_n
                fscale[:len(groups)] = scale_n
                finv[:len(groups)] = inv_n
                mask[:len(groups)] = mask_n
            else:
                feats_n, mask_n, lens = assemble_batch(groups, target_n, dim)
                feats = np.zeros((B, target_n, dim), np.float32)
                mask = np.zeros((B, target_n), np.bool_)
                feats[:len(groups)] = feats_n
                mask[:len(groups)] = mask_n
            t = np.zeros(B, np.float32)
            e = np.zeros(B, np.float32)
            idx = np.full(B, -1, np.int32)
            valid = np.zeros(B, np.bool_)
            for j, i in enumerate(indices):
                lab = ds.bag_label(int(i))
                t[j], e[j] = lab[0], lab[1]
                idx[j] = int(i)
                valid[j] = True
            batch = {"feats": feats, "mask": mask, "t": t, "e": e,
                     "idx": idx, "valid": valid}
            if q8:
                batch["feats_scale"] = fscale
                # same pytree structure as _make_batch/_cast_feats (multi-
                # host desync guard: ADVICE r2)
                if self.precompute_inv:
                    batch["feats_inv"] = finv
            return batch
        except BagOverflowError:
            raise
        except Exception as exc:
            print(f"[BagBatcher] native path failed ({exc}); using numpy")
            return None

    def _batch_indices(self):
        order = self._order()
        n = len(order)
        for start in range(0, n, self.batch_size):
            chunk = order[start:start + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                return
            if self.num_shards > 1:
                # contiguous per-host slice of the GLOBAL batch; identical
                # order on every host (shared seed) keeps shards disjoint
                lo = self.shard_index * self._local_bs
                chunk = chunk[lo:lo + self._local_bs]
            yield chunk

    def __iter__(self) -> Iterator[dict]:
        self._epoch += 1
        if self.prefetch <= 0:
            for chunk in self._batch_indices():
                yield self._make_batch(chunk)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        _SENTINEL = object()
        error_holder = []

        def producer():
            try:
                for chunk in self._batch_indices():
                    q.put(self._make_batch(chunk))
            except BaseException as exc:  # surfaced in consumer
                error_holder.append(exc)
            finally:
                q.put(_SENTINEL)

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            yield item
        th.join()
        if error_holder:
            raise error_holder[0]
