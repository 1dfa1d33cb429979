"""HDF5 volume reader.

Re-design of ``OpenImpala::HDF5Reader`` (``src/io/HDF5Reader.{H,cpp}``):

* a 3-D dataset at a given path; file dims are C-order (Z, Y, X) and are
  mapped to the (X, Y, Z) AMReX convention (``HDF5Reader.cpp:133-153``);
* hyperslab (partial) reads per z- or x-slab for distributed ingest
  (``HDF5Reader.cpp:287-306``);
* supported dtypes: {u,i}{8,16,32}, float32, float64
  (``HDF5Reader.cpp:359-392``);
* string/numeric attribute access (``HDF5Reader.cpp:205-248``).
"""

from __future__ import annotations

import numpy as np


class HDF5Reader:
    slab_axis = 0  # io/ingest.py slab protocol
    def __init__(self, filename: str, dataset: str = "image"):
        import h5py

        self._filename = filename
        self._dataset = dataset
        self._is_read = False
        with h5py.File(filename, "r") as f:
            if dataset not in f:
                raise KeyError(f"HDF5Reader: dataset '{dataset}' not in {filename}")
            ds = f[dataset]
            if ds.ndim != 3:
                raise ValueError(f"HDF5Reader: dataset must be 3-D (got {ds.ndim}-D)")
            zz, yy, xx = ds.shape  # file is C-order (Z, Y, X)
            self.width, self.height, self.depth = int(xx), int(yy), int(zz)
            self.dtype = ds.dtype
        allowed = {"uint8", "int8", "uint16", "int16", "uint32", "int32",
                   "float32", "float64"}
        if self.dtype.name not in allowed:
            raise ValueError(f"HDF5Reader: unsupported dtype {self.dtype}")
        self._is_read = True

    def is_read(self) -> bool:
        return self._is_read

    def box(self):
        return (0, 0, 0), (self.width - 1, self.height - 1, self.depth - 1)

    @property
    def shape(self):
        return (self.width, self.height, self.depth)

    def attribute(self, name: str, dataset: str | None = None):
        """Read an attribute from the dataset (or root group)."""
        import h5py

        with h5py.File(self._filename, "r") as f:
            obj = f[dataset or self._dataset] if (dataset or self._dataset) else f
            val = obj.attrs[name]
        if isinstance(val, bytes):
            return val.decode()
        return val

    def read(self, x0: int = 0, x1: int | None = None) -> np.ndarray:
        """Hyperslab read of the x-slab [x0, x1) -> (x1-x0, Y, Z) array.

        The file stores (Z, Y, X); we select the X range in the last file
        axis (the reversed-dims hyperslab of ``HDF5Reader.cpp:287-306``)."""
        import h5py

        x1 = self.width if x1 is None else x1
        with h5py.File(self._filename, "r") as f:
            slab_zyx = f[self._dataset][:, :, x0:x1]
        return np.ascontiguousarray(np.asarray(slab_zyx).transpose(2, 1, 0))

    def threshold(self, thr: float, vtrue: int = 1, vfalse: int = 0,
                  chunk_x: int = 128) -> np.ndarray:
        out = np.empty(self.shape, np.int8)
        for x0 in range(0, self.width, chunk_x):
            x1 = min(self.width, x0 + chunk_x)
            vals = self.read(x0, x1).astype(np.float64)
            out[x0:x1] = np.where(vals > thr, vtrue, vfalse).astype(np.int8)
        return out
