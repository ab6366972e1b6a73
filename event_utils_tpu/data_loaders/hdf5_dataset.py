"""HDF5-backed voxel dataset (reference lib/data_loaders/hdf5_dataset.py)."""

from __future__ import annotations

from ..utils.event_util import binary_search_h5_dset
from .base_dataset import BaseVoxelDataset
from .data_util import data_sources


class DynamicH5Dataset(BaseVoxelDataset):
    """Voxel dataset over a Monash-layout HDF5 file; events stream from disk
    per window, timestamp lookups use on-disk binary search
    (reference hdf5_dataset.py:6-67)."""

    def get_frame(self, index):
        return self.h5_file["images"][f"image{index:09d}"][:]

    def get_flow(self, index):
        return self.h5_file["flow"][f"flow{index:09d}"][:]

    def get_events(self, idx0, idx1):
        xs = self.h5_file["events/xs"][idx0:idx1]
        ys = self.h5_file["events/ys"][idx0:idx1]
        ts = self.h5_file["events/ts"][idx0:idx1]
        ps = self.h5_file["events/ps"][idx0:idx1] * 2.0 - 1.0
        return xs, ys, ts, ps

    def load_data(self, data_path):
        import h5py
        self.h5_file = h5py.File(data_path, "r")
        f = self.h5_file
        if self.sensor_resolution is None:
            self.sensor_resolution = f.attrs["sensor_resolution"][0:2]
        else:
            self.sensor_resolution = self.sensor_resolution[0:2]
        self.has_flow = "flow" in f and len(f["flow"]) > 0
        self.t0 = f["events/ts"][0]
        self.tk = f["events/ts"][-1]
        self.num_events = int(f.attrs.get("num_events", f["events/ts"].shape[0]))
        self.num_frames = int(f.attrs.get("num_imgs",
                                          len(f["images"]) if "images" in f else 0))
        self.has_frames = self.num_frames > 0
        self.frame_ts = [f[f"images/{k}"].attrs["timestamp"]
                         for k in sorted(f["images"])] if "images" in f else []
        source = f.attrs.get("source", "unknown")
        self.data_source_idx = (data_sources.index(source)
                                if source in data_sources else -1)

    def close(self):
        f = getattr(self, "h5_file", None)
        if f is not None:
            try:
                f.close()
            finally:
                self.h5_file = None

    def find_ts_index(self, timestamp):
        return binary_search_h5_dset(self.h5_file["events/ts"], timestamp)

    def ts(self, index):
        return self.h5_file["events/ts"][index]

    def compute_between_frame_indices(self):
        """Per-frame event ranges from the stored event_idx attrs when the
        file carries them — O(frames) attr reads instead of one on-disk
        binary search per frame.

        The reference's equivalent (hdf5_dataset.py:59-66, named
        ``compute_frame_indices``) is dead code upstream: its base class
        only ever calls ``compute_between_frame_indices``, so the stored
        attrs were never used. Wired in here, with a fallback to the base
        binary-search path for files without (or with inconsistent) attrs.
        """
        if "images" not in self.h5_file:
            # events-only file (load_data supports it): the base table over
            # the empty frame_ts is correct and never touches the file
            return super().compute_between_frame_indices()
        frame_indices = []
        start_idx = 0
        for name in sorted(self.h5_file["images"]):
            attrs = self.h5_file[f"images/{name}"].attrs
            if "event_idx" not in attrs:
                return super().compute_between_frame_indices()
            end_idx = int(attrs["event_idx"])
            if end_idx < start_idx or end_idx > self.num_events:
                return super().compute_between_frame_indices()
            # num_events allowed: end indices are exclusive (the base
            # class's documented divergence from the reference's
            # last-event-dropping clamp)
            frame_indices.append([start_idx, end_idx])
            start_idx = end_idx
        return frame_indices
