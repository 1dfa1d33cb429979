"""Generate the bundled two-phase sample volume in every supported format.

Standalone analogue of the reference's offline generator
(``data/create_sample_structure.py``, which uses porespy "blobs" at
porosity 0.40): here the blobs are coarse Gaussian noise trilinearly
upsampled and thresholded at the requested porosity — no external
dependencies beyond numpy/PIL/h5py.

Outputs (under --out, default ./data):
  sample_2phase_stack_3d_1bit.tif   1-bit multi-page TIFF stack (Z pages)
  sample_2phase_3d.hdf5             uint8 dataset "image", C-order (Z,Y,X)
  sample_2phase_3d_uint8.raw        headerless uint8, XYZ order (k slowest)
  sample_2phase_3d.dat              12-byte int32-LE dims header + uint16

Usage:  python scripts/make_sample_data.py [--n 100] [--porosity 0.4] [--out data]
"""

import argparse
import os
import struct

import numpy as np


def make_blobs(n: int, porosity: float, seed: int = 0) -> np.ndarray:
    """(X,Y,Z) uint8 volume: 1 = pore (fraction ~= porosity), 0 = solid."""
    rng = np.random.default_rng(seed)
    coarse = max(2, n // 8)
    noise = rng.standard_normal((coarse,) * 3)
    # trilinear upsample via successive linear interpolation per axis
    field = noise
    for axis in range(3):
        src = field.shape[axis]
        pos = np.linspace(0, src - 1, n)
        i0 = np.clip(pos.astype(int), 0, src - 2)
        t = (pos - i0).reshape([-1 if a == axis else 1 for a in range(3)])
        lo = np.take(field, i0, axis=axis)
        hi = np.take(field, i0 + 1, axis=axis)
        field = lo * (1 - t) + hi * t
    thr = np.quantile(field, porosity)
    return (field < thr).astype(np.uint8)


def write_tiff_1bit(path: str, vol: np.ndarray):
    """1-bit multi-page TIFF stack, one Z-slice per page (matches the
    reference's SampleData_2Phase_stack_3d_1bit.tif layout)."""
    from PIL import Image

    X, Y, Z = vol.shape
    pages = [
        Image.fromarray((vol[:, :, z].T * 255).astype(np.uint8)).convert("1")
        for z in range(Z)
    ]
    pages[0].save(path, save_all=True, append_images=pages[1:])


def write_hdf5(path: str, vol: np.ndarray, dataset: str = "image"):
    import h5py

    with h5py.File(path, "w") as f:
        # C-order (Z,Y,X) on disk, as the reference writes and HDF5Reader
        # maps back (HDF5Reader.cpp:133-153)
        d = f.create_dataset(dataset, data=np.ascontiguousarray(vol.T))
        d.attrs["porosity"] = float(vol.mean())


def write_raw(path: str, vol: np.ndarray):
    # XYZ order, k (Z) slowest — RawReader.H:55-57
    vol.T.astype(np.uint8).tofile(path)


def write_dat(path: str, vol: np.ndarray):
    X, Y, Z = vol.shape
    with open(path, "wb") as f:
        f.write(struct.pack("<iii", X, Y, Z))  # DatReader.cpp:90-119
        f.write(vol.T.astype("<u2").tobytes())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--porosity", type=float, default=0.4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="data")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    vol = make_blobs(args.n, args.porosity, args.seed)
    print(f"volume {vol.shape}, pore fraction {vol.mean():.4f}")

    write_tiff_1bit(os.path.join(args.out, "sample_2phase_stack_3d_1bit.tif"), vol)
    write_hdf5(os.path.join(args.out, "sample_2phase_3d.hdf5"), vol)
    write_raw(os.path.join(args.out, "sample_2phase_3d_uint8.raw"), vol)
    write_dat(os.path.join(args.out, "sample_2phase_3d.dat"), vol)
    print(f"wrote 4 formats under {args.out}/")


if __name__ == "__main__":
    main()
