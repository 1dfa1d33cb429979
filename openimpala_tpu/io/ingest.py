"""Distributed ingest: reader slabs -> sharded device array, no full-volume
single-device materialisation.

TPU-native counterpart of the reference's per-rank distributed reads — each
MPI rank decodes only the TIFF strips / HDF5 hyperslabs overlapping its
boxes (``TiffReader.cpp:289-444``, ``HDF5Reader.cpp:280-311``).  Here each
device's X slab is thresholded on the host and placed directly into that
device's memory; the global volume is assembled with
``jax.make_array_from_single_device_arrays`` so the int8 phase (and every
f32 solver field derived from it) only ever exists sharded.

Reader slab protocol (``slab_axis`` attribute, class- or instance-level;
``read_slab(lo, hi)`` when the reader's public ``read`` is not the slab
accessor, e.g. HDF5; ``slab_chunk`` optionally hints the IO-aligned read
granularity, e.g. the HDF5 chunk Z-extent):

* 0 — the reader reads X slabs directly: RAW memmap ranges, HDF5 files
  whose chunks tile X finely (then an X hyperslab touches only overlapping
  chunks).  Host peak memory = one slab; per-host IO ≈ its X share.
* 2 — the reader streams Z slabs (TIFF pages; contiguous/z-chunked HDF5);
  slabs are scattered into per-device X buffers as they decode.  Each Z
  slab is read ONCE per host — per-host IO ≈ file size, independent of
  device count.  Host peak = int8 phase volume (1 GiB at 1024^3) — the f32
  state still never exists unsharded.
* None — whole-file readers (DAT, mirroring ``DatReader.cpp:122-145``).
"""

from __future__ import annotations

import numpy as np

PAD_FILL = -1  # padding value outside the physical domain: not a phase id


def threshold_sharded(reader, thr: float, mesh, vtrue: int = 1,
                      vfalse: int = 0, chunk: int = 64):
    """Threshold ``reader``'s volume into an int8 (X, Y, Z) jax.Array sharded
    along X over ``mesh``; X is padded to mesh divisibility with PAD_FILL
    cells (outside every phase, hence inactive in all operators).

    Returns ``(phase_sharded, original_shape)``.
    """
    import jax
    from jax.sharding import NamedSharding

    from ..parallel.mesh import volume_pspec

    X, Y, Z = reader.shape
    devices = list(mesh.devices.ravel())
    n = len(devices)
    Xp = X + ((-X) % n)
    xloc = Xp // n
    sharding = NamedSharding(mesh, volume_pspec())
    slab_axis = getattr(reader, "slab_axis", None)
    read_slab = getattr(reader, "read_slab", reader.read)
    slab_chunk = getattr(reader, "slab_chunk", None)
    if slab_chunk:  # align read boundaries to the reader's IO granularity
        chunk = -(-max(chunk, slab_chunk) // slab_chunk) * slab_chunk

    def _threshold(vals):
        return np.where(vals.astype(np.float64) > thr, vtrue, vfalse).astype(np.int8)

    # multi-host: this process materialises shards ONLY for its own devices
    # (the per-rank distributed read of the reference); other processes
    # build theirs — make_array_from_single_device_arrays stitches the
    # global array from everyone's addressable shards.
    mine = [d for d in range(n)
            if devices[d].process_index == jax.process_index()]
    shards = []
    if slab_axis == 0:
        # hyperslab path: read exactly each local device's X slab
        for d in mine:
            x0, x1 = d * xloc, min((d + 1) * xloc, X)
            slab = np.full((xloc, Y, Z), PAD_FILL, np.int8)
            if x0 < X:
                slab[: x1 - x0] = _threshold(read_slab(x0, x1))
            shards.append(jax.device_put(slab, devices[d]))
    else:
        # streaming path: z (or whole-file) reads scattered into X buffers
        buffers = {d: np.full((xloc, Y, Z), PAD_FILL, np.int8) for d in mine}
        if slab_axis == 2:
            for z0 in range(0, Z, chunk):
                z1 = min(Z, z0 + chunk)
                part = _threshold(read_slab(z0, z1))  # (X, Y, z1-z0)
                for d in mine:
                    x0, x1 = d * xloc, min((d + 1) * xloc, X)
                    if x0 < X:
                        buffers[d][: x1 - x0, :, z0:z1] = part[x0:x1]
        else:
            full = _threshold(reader.read())
            for d in mine:
                x0, x1 = d * xloc, min((d + 1) * xloc, X)
                if x0 < X:
                    buffers[d][: x1 - x0] = full[x0:x1]
        shards = [jax.device_put(buffers[d], devices[d]) for d in mine]

    global_shape = (Xp, Y, Z)
    arr = jax.make_array_from_single_device_arrays(global_shape, sharding,
                                                   shards)
    return arr, (X, Y, Z)
