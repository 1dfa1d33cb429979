"""Inputs-file configuration surface tests (ParmParse compat, §2.4 schema)."""

import pytest

from openimpala_tpu.config import (DiffusionConfig, ParmParse, resolve_solver,
                                   solver_notice)


def _cfg(text: str) -> DiffusionConfig:
    pp = ParmParse()
    pp.parse_text("filename = a.tif\n" + text)
    return DiffusionConfig.from_parmparse(pp)


def test_parmparse_basics():
    pp = ParmParse()
    pp.parse_text("""
        a.b = 3          # comment
        s = "two words"
        lst = 1 2 3
        a.b = 4          # later definition wins (ParmParse semantics)
    """)
    assert pp.query("a.b", type=int) == 4
    assert pp.query("s") == "two words"
    assert pp.query_list("lst", type=int) == [1, 2, 3]
    assert pp.query("missing", "dflt") == "dflt"
    with pytest.raises(KeyError):
        pp.get("missing")


def test_hypre_maxiter_honored():
    """An explicit hypre.maxiter becomes the Krylov budget
    (TortuosityHypre.cpp:143); solver.krylov_maxiter overrides; neither set
    keeps the TPU-native default."""
    assert _cfg("").krylov_maxiter == 20000
    assert _cfg("hypre.maxiter = 300").krylov_maxiter == 300
    c = _cfg("hypre.maxiter = 300\nsolver.krylov_maxiter = 5000")
    assert c.krylov_maxiter == 5000 and c.maxiter == 300


def test_rev_batch_key():
    """rev.batch (VERDICT r3 item 5): auto default, tri-state accepted,
    anything else rejected loudly."""
    assert _cfg("").rev_batch == "auto"
    assert _cfg("rev.batch = true").rev_batch == "true"
    assert _cfg("rev.batch = False").rev_batch == "false"
    assert _cfg("rev.batch = AUTO").rev_batch == "auto"
    with pytest.raises(ValueError, match="rev.batch"):
        _cfg("rev.batch = maybe")


def test_raw_key_spellings():
    """Both the dotted raw.* block and the underscore forms the reference
    README documents (README.md:222) are accepted; dotted wins when both
    appear."""
    c = _cfg("raw_width = 10\nraw_height = 20\nraw_depth = 30\n"
             "raw_datatype = FLOAT32LE")
    assert (c.raw_width, c.raw_height, c.raw_depth) == (10, 20, 30)
    assert c.raw_datatype == "FLOAT32LE"
    c = _cfg("raw_width = 10\nraw.width = 99")
    assert c.raw_width == 99


def test_solver_surface():
    # the full reference name surface (Diffusion.cpp:45-58) is accepted
    for name in ["FlexGMRES", "GMRES", "FGMRES", "PCG", "CG", "Jacobi",
                 "BiCGSTAB", "SMG", "PFMG"]:
        assert resolve_solver(name) in ("cg", "flexgmres")
    with pytest.raises(ValueError, match="Invalid solver string"):
        resolve_solver("AMG")


def test_tortuosity_verbose_key():
    """tortuosity.verbose (TortuosityHypre.cpp:150-157): parsed as the
    per-component verbosity; -1 default means inherit the global level."""
    assert _cfg("").tortuosity_verbose == -1
    assert _cfg("tortuosity.verbose = 3").tortuosity_verbose == 3
    assert _cfg("verbose = 2\ntortuosity.verbose = 0").tortuosity_verbose == 0


def test_solver_notice():
    """Reference names that silently map onto CG get a runtime notice
    (VERDICT r4 weak #3); identity and kept-algorithm names do not."""
    assert "CG" in solver_notice("FlexGMRES")
    assert solver_notice("SMG") is not None
    assert solver_notice("CG") is None
    assert solver_notice("PCG") is None
    assert solver_notice("GMRES") is None  # keeps the real FGMRES impl
    assert solver_notice("FGMRES") is None


def test_voxel_size_key():
    """voxel_size: 1 value = isotropic, 3 = per-axis (new surface; the
    reference CLI pins a unit RealBox but its kernels are dx-generic)."""
    assert _cfg("").voxel_size == (1.0, 1.0, 1.0)
    assert _cfg("voxel_size = 0.5").voxel_size == (0.5, 0.5, 0.5)
    assert _cfg("voxel_size = 1.0 1.0 2.5").voxel_size == (1.0, 1.0, 2.5)
    with pytest.raises(ValueError):
        _cfg("voxel_size = 1.0 2.0")
    with pytest.raises(ValueError):
        _cfg("voxel_size = 1.0 -1.0 2.0")
