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
  sample_2phase_3d.vtk              legacy VTK STRUCTURED_POINTS (visual
                                    inspection; reference emits VTK too,
                                    create_sample_structure.py:116-122)
  sample_2phase_3d.xmf              XDMF sidecar referencing the .hdf5
                                    (create_sample_structure.py:139-160)
  sample_2phase_seq_%04d.tif        per-Z single-page 8-bit TIFF sequence
                                    (exercises the reader's %0Nd path,
                                    TiffReader.cpp:85-138)

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


def write_vtk(path: str, vol: np.ndarray):
    """Legacy VTK STRUCTURED_POINTS (binary), x varying fastest — the
    visual-inspection copy the reference emits via porespy
    (create_sample_structure.py:116-122)."""
    X, Y, Z = vol.shape
    header = (
        "# vtk DataFile Version 3.0\n"
        "openimpala_tpu two-phase sample volume\n"
        "BINARY\n"
        "DATASET STRUCTURED_POINTS\n"
        f"DIMENSIONS {X} {Y} {Z}\n"
        "ORIGIN 0 0 0\n"
        "SPACING 1 1 1\n"
        f"POINT_DATA {X * Y * Z}\n"
        "SCALARS phase unsigned_char 1\n"
        "LOOKUP_TABLE default\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode())
        f.write(np.ascontiguousarray(vol.T, np.uint8).tobytes())
        f.write(b"\n")


def write_xdmf(path: str, vol: np.ndarray, h5name: str, dataset: str = "image"):
    """XDMF sidecar pointing at the HDF5 copy so the sample opens directly
    in ParaView (reference parity: create_sample_structure.py:139-160)."""
    X, Y, Z = vol.shape
    content = f"""<?xml version="1.0" ?>
<!DOCTYPE Xdmf SYSTEM "Xdmf.dtd" []>
<Xdmf Version="3.0">
  <Domain>
    <Grid Name="SampleVolume" GridType="Uniform">
      <Topology TopologyType="3DCoRectMesh" Dimensions="{Z + 1} {Y + 1} {X + 1}"/>
      <Geometry GeometryType="ORIGIN_DXDYDZ">
        <DataItem Dimensions="3" Format="XML">0 0 0</DataItem>
        <DataItem Dimensions="3" Format="XML">1 1 1</DataItem>
      </Geometry>
      <Attribute Name="phase" AttributeType="Scalar" Center="Cell">
        <DataItem Dimensions="{Z} {Y} {X}" NumberType="UChar" Precision="1" Format="HDF">{h5name}:/{dataset}</DataItem>
      </Attribute>
    </Grid>
  </Domain>
</Xdmf>
"""
    with open(path, "w") as f:
        f.write(content)


def write_tiff_sequence(out_dir: str, base: str, vol: np.ndarray):
    """Per-Z-slice 8-bit grayscale single-page TIFFs named ``base_%04d.tif``
    (0-based), the numbered-sequence layout the reader's %0Nd pattern mode
    consumes (TiffReader.cpp:85-138)."""
    from PIL import Image

    Z = vol.shape[2]
    for z in range(Z):
        img = Image.fromarray((vol[:, :, z].T * 255).astype(np.uint8), "L")
        img.save(os.path.join(out_dir, f"{base}_{z:04d}.tif"))
    return Z


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--porosity", type=float, default=0.4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="data")
    ap.add_argument("--no-sequence", action="store_true",
                    help="skip the per-Z TIFF sequence output")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    vol = make_blobs(args.n, args.porosity, args.seed)
    print(f"volume {vol.shape}, pore fraction {vol.mean():.4f}")

    write_tiff_1bit(os.path.join(args.out, "sample_2phase_stack_3d_1bit.tif"), vol)
    write_hdf5(os.path.join(args.out, "sample_2phase_3d.hdf5"), vol)
    write_raw(os.path.join(args.out, "sample_2phase_3d_uint8.raw"), vol)
    write_dat(os.path.join(args.out, "sample_2phase_3d.dat"), vol)
    write_vtk(os.path.join(args.out, "sample_2phase_3d.vtk"), vol)
    write_xdmf(os.path.join(args.out, "sample_2phase_3d.xmf"), vol,
               "sample_2phase_3d.hdf5")
    n_seq = 0
    if not args.no_sequence:
        n_seq = write_tiff_sequence(args.out, "sample_2phase_seq", vol)
    print(f"wrote 6 formats (+{n_seq} sequence slices) under {args.out}/")


if __name__ == "__main__":
    main()
