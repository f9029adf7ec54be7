"""HDF5-backed dataset, seeded samplers, and a prefetching loader.

Mirrors ``utils/data_generator.py`` with two deliberate fixes:

* the dataset keeps HDF5 handles open per path instead of reopening the
  file for every item (``data_generator.py:37``);
* ``TrainSampler`` draws ``audio_indexes[pointer]`` directly — the
  reference composes the permutation with itself
  (``data_generator.py:88-98``), which is distributionally identical but
  gratuitous.

``shard_for_host`` slices batches for multi-host (DCN) training: each
process loads only its share of the global batch.
"""

from __future__ import annotations

import threading
import queue as queue_mod
from typing import Dict, Iterator, List, Optional

import h5py
import numpy as np

from sed_tpu.data.hdf5_pack import int16_to_float32


class AudiosetDataset:
    """Map-style dataset over packed HDF5 files, keyed by batch meta
    ``{'hdf5_path', 'index_in_hdf5'}`` (``data_generator.py:15-49``)."""

    def __init__(self):
        self._handles: Dict[str, h5py.File] = {}
        self._lock = threading.Lock()

    def _file(self, path: str) -> h5py.File:
        with self._lock:
            if path not in self._handles:
                self._handles[path] = h5py.File(path, 'r')
            return self._handles[path]

    def __getitem__(self, meta: dict) -> dict:
        hf = self._file(meta['hdf5_path'])
        i = meta['index_in_hdf5']
        data = {
            'audio_name': hf['audio_name'][i].decode(),
            'waveform': int16_to_float32(hf['waveform'][i]),
            'target': hf['target'][i].astype(np.float32),
        }
        if 'strong_target' in hf:
            data['strong_target'] = hf['strong_target'][i].astype(np.float32)
        return data

    def close(self):
        with self._lock:
            for f in self._handles.values():
                f.close()
            self._handles.clear()


class TrainSampler:
    """Infinite shuffled batch-meta stream, seed 1234
    (``data_generator.py:52-101``)."""

    def __init__(self, hdf5_path: str, batch_size: int,
                 random_seed: int = 1234):
        self.hdf5_path = hdf5_path
        self.batch_size = batch_size
        self.random_state = np.random.RandomState(random_seed)
        with h5py.File(hdf5_path, 'r') as hf:
            self.audios_num = len(hf['audio_name'])
        self.audio_indexes = np.arange(self.audios_num)
        self.random_state.shuffle(self.audio_indexes)
        self.pointer = 0

    def __iter__(self) -> Iterator[List[dict]]:
        while True:
            batch_meta = []
            for _ in range(self.batch_size):
                index = int(self.audio_indexes[self.pointer])
                self.pointer += 1
                if self.pointer >= self.audios_num:
                    self.pointer = 0
                    self.random_state.shuffle(self.audio_indexes)
                batch_meta.append({'hdf5_path': self.hdf5_path,
                                   'index_in_hdf5': index})
            yield batch_meta


class TestSampler:
    """Sequential batches over a split (``data_generator.py:104-145``)."""

    __test__ = False  # not a pytest class

    def __init__(self, hdf5_path: str, batch_size: int):
        self.hdf5_path = hdf5_path
        self.batch_size = batch_size
        with h5py.File(hdf5_path, 'r') as hf:
            self.audios_num = len(hf['audio_name'])

    def __iter__(self) -> Iterator[List[dict]]:
        for ptr in range(0, self.audios_num, self.batch_size):
            yield [{'hdf5_path': self.hdf5_path, 'index_in_hdf5': i}
                   for i in range(ptr,
                                  min(ptr + self.batch_size,
                                      self.audios_num))]


def collate_fn(list_data_dict: List[dict]) -> Dict[str, np.ndarray]:
    """dict-of-lists -> dict-of-arrays (``data_generator.py:148-164``)."""
    return {key: np.array([d[key] for d in list_data_dict])
            for key in list_data_dict[0]}


class DataLoader:
    """Dataset x sampler with background-thread prefetch (the stand-in
    for torch DataLoader(num_workers=8), ``main_strong.py:254-268``)."""

    def __init__(self, dataset: AudiosetDataset, batch_sampler,
                 collate=collate_fn, prefetch: int = 4):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.collate = collate
        self.prefetch = prefetch

    def _produce(self, q: queue_mod.Queue, stop: threading.Event):
        try:
            for batch_meta in self.batch_sampler:
                if stop.is_set():
                    return
                q.put(self.collate([self.dataset[m] for m in batch_meta]))
            q.put(None)
        except Exception as exc:  # surface worker errors to the consumer
            q.put(exc)

    def __iter__(self):
        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        worker = threading.Thread(target=self._produce, args=(q, stop),
                                  daemon=True)
        worker.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def cycle_iteration(loader: DataLoader):
    """Endless batches (``main_strong.py:35-38``)."""
    while True:
        for batch in loader:
            yield batch


def shard_for_host(batch: Dict[str, np.ndarray],
                   process_index: Optional[int] = None,
                   process_count: Optional[int] = None
                   ) -> Dict[str, np.ndarray]:
    """Slice a global batch to this host's share for multi-host (DCN)
    data loading; single-process setups get the batch unchanged."""
    if process_count is None:
        import jax
        process_index = jax.process_index()
        process_count = jax.process_count()
    if process_count == 1:
        return batch
    out = {}
    for k, v in batch.items():
        n = v.shape[0]
        share = n // process_count
        out[k] = v[process_index * share:(process_index + 1) * share]
    return out
