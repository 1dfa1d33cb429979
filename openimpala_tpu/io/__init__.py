"""Host-side volume readers and result writers.

Replaces the reference's ``src/io/`` layer (libtiff/HDF5-C++/iostream based
readers + AMReX plotfiles).  All readers share the reference contract
(``TiffReader.H:102-180``): construction reads METADATA only; ``box()`` /
``width()/height()/depth()`` expose the domain; ``threshold(thr, vtrue,
vfalse)`` materialises the segmented volume with strict ``value > thr``
semantics; ``read(zslice/xrange)`` supports chunked ingest so no host ever
needs more than its shard (SURVEY.md §3.5).

Volumes are returned as (X, Y, Z) numpy arrays — index (i, j, k) matches the
reference's AMReX cell (i, j, k).

An optional native C++ decode path (``openimpala_tpu.io.native``) accelerates
TIFF/RAW/DAT decoding; the pure-Python implementations are always available.
"""

from .tiff import TiffReader
from .hdf5 import HDF5Reader
from .dat import DatReader
from .raw import RawReader, RawDataType
from .ingest import threshold_sharded
from .writers import (
    write_results_txt,
    write_volume_hdf5_xdmf,
    read_any,
)
from .cathode import CathodeParams, write_dandeliion_parameters, write_pybamm_parameters

__all__ = [
    "threshold_sharded",
    "TiffReader",
    "HDF5Reader",
    "DatReader",
    "RawReader",
    "RawDataType",
    "write_results_txt",
    "write_volume_hdf5_xdmf",
    "read_any",
    "CathodeParams",
    "write_dandeliion_parameters",
    "write_pybamm_parameters",
]
