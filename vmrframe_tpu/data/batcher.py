"""Static-shape batch assembly + host-side prefetch.

TPU-first replacement for the reference's Dataset/Collate pair
(utils/BaseDataset.py:10-235) and single-process DataLoader
(utils/DataLoader.py:4-15):

- every batch has the SAME shapes: (B, vlen, vdim) features, (B, tlen) word
  ids, (B, tlen, char_len) char ids, plus masks — the last partial batch is
  padded and carries a ``sample_mask`` so metrics/losses stay exact;
- per-vid resampled features are cached for the ``unchanged`` augmentation
  path (deterministic), so steady-state epochs only do cheap label math;
- ``BatchPrefetcher`` overlaps next-batch host assembly + H2D transfer with
  device compute (double buffering, the "input pipeline" of BASELINE.json).
"""

from __future__ import annotations

import queue
import random
import threading
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

from vmrframe_tpu.data.augment import sample_vfeat_linear, video_augmentation
from vmrframe_tpu.data.labels import dist_idx_label, label_span_from_curve, ner_label
from vmrframe_tpu.metrics import frac_idx


class Batcher:
    """Assemble fixed-shape numpy batches from records + a feature store."""

    def __init__(self, dataset: List[dict], feature_store, cfg, derived, loadertype: str,
                 batch_size: Optional[int] = None, num_workers: Optional[int] = None):
        self.dataset = dataset
        self.features = feature_store
        self.cfg = cfg
        self.derived = derived
        self.loadertype = loadertype
        self.batch_size = batch_size or cfg.train.batch_size
        # per-sample numpy work (augment + resample) parallelizes across a
        # thread pool — numpy releases the GIL on the big reductions
        if num_workers is None:
            num_workers = int(cfg.train.get("num_workers", 0)) if "train" in cfg else 0
        self.num_workers = num_workers
        self._pool = None
        if self.num_workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=self.num_workers)
        self.vlen = cfg.model.vlen
        self.tlen = cfg.model.get("tlen", 30)  # some configs omit tlen (e.g. CCA.yaml)
        self.vdim = cfg.model.vdim
        self.char_len = derived.char_len
        # some reference configs ship without a dataprocess section (e.g.
        # config/charades/BAN.json) — default to the identity pipeline
        dp = cfg.get("dataprocess")
        aug = dp.get("video_augmentation") if dp else None
        self.aug = dict(aug.to_dict() if hasattr(aug, "to_dict") else aug) if aug else {"unchanged": None}
        self.sample_type = dp.get("sample_type", "truncation") if dp else "truncation"
        self._resample_cache: Dict[str, np.ndarray] = {}
        self._aug_is_identity = set(self.aug.keys()) == {"unchanged"}
        # on-device pipeline (ops/input_pipeline.py): ship padded raw
        # features; augmentation/resampling/labels run inside the jitted step.
        # OPT-IN (dataprocess.device_pipeline: true).  Measured end-to-end
        # (tools/bench_pipeline.py, docs/BENCH_PIPELINE.json): it trades host
        # assembly (~110 ms/batch erosion at B=128) for H2D BYTES — raw
        # features are max_raw_len long vs the resampled vlen (4× at Charades)
        # — and on this environment's tunneled interconnect that trade LOSES
        # (0.57–0.9× samples/s), so host assembly + prefetch is the default.
        # Enable it where the host CPU, not the interconnect, is the
        # bottleneck (co-located hosts with fat DMA and slow/contended CPUs).
        self.device_pipeline = bool(dp.get("device_pipeline", False)) if dp else False
        if self.device_pipeline and (len(self.aug) != 1 or self.sample_type == "original"):
            self.device_pipeline = False  # multi-aug choice / 'original' stay on host
        self._max_raw_len = 0
        self._batch_counter = 0
        if self.device_pipeline:
            lens = feature_store.lengths()
            self._max_raw_len = max(lens[self.dataset[i]["vid"]] for i in range(len(dataset)))

    def __len__(self) -> int:
        return (len(self.dataset) + self.batch_size - 1) // self.batch_size

    @property
    def num_samples(self) -> int:
        return len(self.dataset)

    def _get_vfeat_label(self, record: dict, rng: random.Random):
        sfrac, efrac = record["se_frac"]
        vid = record["vid"]
        if self._aug_is_identity and self.sample_type in ("truncation", "samelen"):
            # deterministic path: resampled features cacheable per vid
            vfeat = self._resample_cache.get(vid)
            raw_len = None
            if vfeat is None:
                raw = self.features[vid]
                raw_len = raw.shape[0]
                vfeat, _ = sample_vfeat_linear(raw, np.zeros(raw.shape[0], np.float32),
                                               self.vlen, self.sample_type)
                self._resample_cache[vid] = vfeat
                self._resample_cache[vid + "/rawlen"] = raw_len
            raw_len = self._resample_cache[vid + "/rawlen"]
            label = np.zeros(raw_len, dtype=np.float32)
            sidx0, eidx0 = frac_idx([sfrac, efrac], raw_len)
            label[sidx0:eidx0 + 1] = 1.0
            _, label = sample_vfeat_linear(np.zeros((raw_len, 1), np.float32), label,
                                           self.vlen, self.sample_type)
            return vfeat, label
        raw = self.features[vid]
        vfeat, label = video_augmentation(sfrac, efrac, raw, self.aug, rng)
        assert not np.all(label == 0), f"empty label after augmentation: {vid}"
        vfeat, label = sample_vfeat_linear(vfeat, label, self.vlen, self.sample_type)
        assert not np.all(label == 0), f"empty label after sampling: {vid}"
        return vfeat, label

    def _make_raw_batch(self, indices: List[int], rng: random.Random) -> Dict[str, np.ndarray]:
        """Device-pipeline batch: padded raw features + metadata only."""
        B, tlen, clen = self.batch_size, self.tlen, self.char_len
        max_raw = self._max_raw_len
        raw = np.zeros((B, max_raw, self.vdim), dtype=np.float32)
        raw_lens = np.ones((B,), dtype=np.int32)
        words_ids = np.zeros((B, tlen), dtype=np.int32)
        char_ids = np.zeros((B, tlen, clen), dtype=np.int32)
        se_times = np.zeros((B, 2), dtype=np.float32)
        se_fracs = np.zeros((B, 2), dtype=np.float32)
        sample_mask = np.zeros((B,), dtype=np.float32)
        for slot, idx in enumerate(indices):
            record = self.dataset[idx]
            f = self.features[record["vid"]]
            raw[slot, : f.shape[0]] = f
            raw_lens[slot] = f.shape[0]
            wids = record["wids"][:tlen]
            words_ids[slot, : len(wids)] = wids
            for wi, cids in enumerate(record["cids"][:tlen]):
                char_ids[slot, wi, : len(cids[:clen])] = cids[:clen]
            se_times[slot] = record["se_time"]
            se_fracs[slot] = record["se_frac"]
            sample_mask[slot] = 1.0
        self._batch_counter += 1
        return {
            "raw_vfeats": raw,
            "raw_lens": raw_lens,
            "words_ids": words_ids,
            "char_ids": char_ids,
            "tmasks": (words_ids != 0).astype(np.float32),
            "se_times": se_times,
            "se_fracs": se_fracs,
            "sample_mask": sample_mask,
            "pipeline_seed": np.int32(rng.randrange(2**31)),
            "num_valid": np.int32(len(indices)),
        }

    def make_batch(self, indices: List[int], rng: random.Random) -> Dict[str, np.ndarray]:
        if self.device_pipeline:
            return self._make_raw_batch(indices, rng)
        B = self.batch_size
        n = len(indices)
        vlen, tlen, clen = self.vlen, self.tlen, self.char_len

        vfeats = np.zeros((B, vlen, self.vdim), dtype=np.float32)
        vmasks = np.zeros((B, vlen), dtype=np.float32)
        words_ids = np.zeros((B, tlen), dtype=np.int32)
        char_ids = np.zeros((B, tlen, clen), dtype=np.int32)
        label1ds = np.zeros((B, 2, vlen), dtype=np.float32)
        ner_labels = np.zeros((B, vlen), dtype=np.int32)
        se_times = np.zeros((B, 2), dtype=np.float32)
        se_fracs = np.zeros((B, 2), dtype=np.float32)
        sample_mask = np.zeros((B,), dtype=np.float32)

        if self._pool is not None:
            # deterministic per-sample rngs drawn from the epoch rng, then
            # fan the numpy-heavy work across the pool
            seeds = [rng.randrange(2**32) for _ in indices]
            results = list(self._pool.map(
                lambda args: self._get_vfeat_label(self.dataset[args[0]], random.Random(args[1])),
                zip(indices, seeds)))
        else:
            results = [self._get_vfeat_label(self.dataset[idx], rng) for idx in indices]

        for slot, idx in enumerate(indices):
            record = self.dataset[idx]
            vfeat, label = results[slot]
            cur_len = vfeat.shape[0]
            sidx, eidx = label_span_from_curve(label)
            vfeats[slot, :cur_len] = vfeat
            vmasks[slot, :cur_len] = 1.0
            label1ds[slot] = dist_idx_label(sidx, eidx, vlen)
            ner_labels[slot] = ner_label(sidx, eidx, cur_len, vlen)
            wids = record["wids"][:tlen]
            words_ids[slot, : len(wids)] = wids
            for wi, cids in enumerate(record["cids"][:tlen]):
                cids = cids[:clen]
                char_ids[slot, wi, : len(cids)] = cids
            se_times[slot] = record["se_time"]
            se_fracs[slot] = record["se_frac"]
            sample_mask[slot] = 1.0

        tmasks = (words_ids != 0).astype(np.float32)
        return {
            "vfeats": vfeats,
            "vmasks": vmasks,
            "words_ids": words_ids,
            "char_ids": char_ids,
            "tmasks": tmasks,
            "label1ds": label1ds,
            "NER_labels": ner_labels,
            "se_times": se_times,
            "se_fracs": se_fracs,
            "sample_mask": sample_mask,
            "num_valid": np.int32(n),
        }

    def epoch(self, seed: int, shuffle: Optional[bool] = None) -> Iterator[Dict[str, np.ndarray]]:
        shuffle = (self.loadertype == "train") if shuffle is None else shuffle
        rng = random.Random(seed)
        order = list(range(len(self.dataset)))
        if shuffle:
            rng.shuffle(order)
        for i in range(0, len(order), self.batch_size):
            yield self.make_batch(order[i : i + self.batch_size], rng)


class BatchPrefetcher:
    """Background-thread prefetch: assemble + (optionally) device_put the next
    batches while the device runs the current step."""

    def __init__(self, batch_iter: Iterator[Dict[str, Any]], put_fn=None, depth: int = 2):
        self._queue: "queue.Queue" = queue.Queue(maxsize=depth)
        self._put_fn = put_fn
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker, args=(batch_iter,), daemon=True)
        self._thread.start()

    def _worker(self, batch_iter):
        try:
            for batch in batch_iter:
                if self._put_fn is not None:
                    batch = self._put_fn(batch)
                self._queue.put(batch)
        except BaseException as e:  # propagate to consumer
            self._err = e
        finally:
            self._queue.put(None)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is None:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
