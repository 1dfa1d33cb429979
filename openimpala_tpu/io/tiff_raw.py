"""Minimal numpy TIFF codec for UNCOMPRESSED files — the coverage PIL lacks.

The reference decodes TIFFs with libtiff and supports BPS ∈ {1,8,16,32,64},
unsigned/signed/float samples, striped AND tiled layouts, and both FillOrder
values (``TiffReader.cpp:167-173, 354-437``).  PIL cannot represent 64-bit
or float-64 samples and its tiled support is spotty, so this module parses
the IFD chain directly and decodes uncompressed strips/tiles with vectorised
numpy (bit unpacking via ``np.unpackbits`` with the FillOrder bit order).
Compressed files fall back to PIL in io/tiff.py.

Also provides ``write_tiff`` (uncompressed, striped or tiled, any supported
dtype) for fixtures and round-trip tests.
"""

from __future__ import annotations

import struct

import numpy as np

# tag ids
W, H, BPS, COMP, SPP, FMT = 256, 257, 258, 259, 277, 339
STRIP_OFF, ROWS_PER_STRIP, STRIP_CNT = 273, 278, 279
TILE_W, TILE_L, TILE_OFF, TILE_CNT = 322, 323, 324, 325
FILL_ORDER = 266

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8,
              11: 4, 12: 8, 16: 8, 17: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 16: "Q"}


class RawTiff:
    """IFD-chain parser; raises ValueError on anything it cannot decode
    (callers fall back to PIL)."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            head = f.read(8)
            if head[:2] == b"II":
                self.bo = "<"
            elif head[:2] == b"MM":
                self.bo = ">"
            else:
                raise ValueError("not a TIFF")
            magic, off = struct.unpack(self.bo + "HI", head[2:8])
            if magic != 42:
                raise ValueError("BigTIFF not supported here")
            self.pages = []
            while off:
                page, off = self._read_ifd(f, off)
                self.pages.append(page)

    def _read_ifd(self, f, off):
        f.seek(off)
        (n,) = struct.unpack(self.bo + "H", f.read(2))
        raw = f.read(n * 12)
        (nxt,) = struct.unpack(self.bo + "I", f.read(4))
        tags = {}
        for i in range(n):
            tag, typ, cnt = struct.unpack(self.bo + "HHI", raw[i * 12:i * 12 + 8])
            val = raw[i * 12 + 8:i * 12 + 12]
            if typ not in _TYPE_FMT:
                continue  # skip rationals/ascii — not needed
            size = _TYPE_SIZE[typ] * cnt
            if size > 4:
                (ptr,) = struct.unpack(self.bo + "I", val)
                f.seek(ptr)
                data = f.read(size)
            else:
                data = val[:size]
            tags[tag] = list(struct.unpack(self.bo + str(cnt) + _TYPE_FMT[typ],
                                           data))
        return tags, nxt

    # -- per-page metadata --------------------------------------------------
    def meta(self, i: int):
        t = self.pages[i]
        bps = t.get(BPS, [1])[0]
        fmt = {1: "uint", 2: "int", 3: "float"}.get(t.get(FMT, [1])[0], "uint")
        return {
            "width": t[W][0], "height": t[H][0], "bps": bps, "format": fmt,
            "spp": t.get(SPP, [1])[0],
            "compression": t.get(COMP, [1])[0],
            "fill_order": t.get(FILL_ORDER, [1])[0],
            "tiled": TILE_OFF in t,
        }

    def _dtype(self, bps, fmt):
        if bps == 1:
            return None  # packed bits
        kind = {"uint": "u", "int": "i", "float": "f"}[fmt]
        if fmt == "float" and bps not in (32, 64):
            raise ValueError(f"float{bps} samples unsupported")
        return np.dtype(f"{self.bo}{kind}{bps // 8}")

    def _unpack_rows(self, buf, n_rows, width, fill_order):
        """1-bit packed rows -> (n_rows, width) bool."""
        row_bytes = (width + 7) // 8
        arr = np.frombuffer(buf[: n_rows * row_bytes], np.uint8)
        arr = arr.reshape(n_rows, row_bytes)
        bits = np.unpackbits(arr, axis=1,
                             bitorder="big" if fill_order == 1 else "little")
        return bits[:, :width].astype(bool)

    def read_page(self, i: int) -> np.ndarray:
        """(H, W) array in the page's native dtype (bool for 1-bit)."""
        t = self.pages[i]
        m = self.meta(i)
        if m["compression"] != 1:
            raise ValueError("compressed TIFF — use the PIL path")
        if m["spp"] != 1:
            raise ValueError("only 1 sample per pixel supported "
                             "(TiffReader.cpp:167-173)")
        height, width, bps = m["height"], m["width"], m["bps"]
        dtype = self._dtype(bps, m["format"])
        with open(self.path, "rb") as f:
            if m["tiled"]:
                tw, tl = t[TILE_W][0], t[TILE_L][0]
                out = np.zeros((height, width),
                               dtype if dtype is not None else bool)
                tiles_across = -(-width // tw)
                for ti, off in enumerate(t[TILE_OFF]):
                    f.seek(off)
                    cnt = t[TILE_CNT][ti]
                    buf = f.read(cnt)
                    if bps == 1:
                        tile = self._unpack_rows(buf, tl, tw, m["fill_order"])
                    else:
                        tile = np.frombuffer(buf, dtype,
                                             count=tl * tw).reshape(tl, tw)
                    r0 = (ti // tiles_across) * tl
                    c0 = (ti % tiles_across) * tw
                    out[r0:r0 + tl, c0:c0 + tw] = tile[: height - r0, : width - c0]
                return out
            rows_per = t.get(ROWS_PER_STRIP, [height])[0]
            rows = []
            for si, off in enumerate(t[STRIP_OFF]):
                f.seek(off)
                buf = f.read(t[STRIP_CNT][si])
                n_rows = min(rows_per, height - si * rows_per)
                if bps == 1:
                    rows.append(self._unpack_rows(buf, n_rows, width,
                                                  m["fill_order"]))
                else:
                    rows.append(np.frombuffer(buf, dtype, count=n_rows * width)
                                .reshape(n_rows, width))
            return np.concatenate(rows, axis=0)


def write_tiff(path: str, pages, tile: tuple[int, int] | None = None,
               fill_order: int = 1):
    """Write uncompressed single-sample TIFF pages (striped, or tiled when
    ``tile=(tl, tw)``).  Supports bool (1-bit packed), {u,}int{8,16,32,64}
    and float{32,64} pages — the fixture writer for decode tests."""
    pages = [np.asarray(p) for p in pages]
    out = bytearray(b"II*\x00\x00\x00\x00\x00")
    ifd_ptr_pos = 4

    for p in pages:
        height, width = p.shape
        if p.dtype == bool:
            bps, fmt = 1, 1
            packer = lambda a: np.packbits(
                a, axis=1, bitorder="big" if fill_order == 1 else "little"
            ).tobytes()
        else:
            bps = p.dtype.itemsize * 8
            fmt = {"u": 1, "i": 2, "f": 3}[p.dtype.kind]
            packer = lambda a: a.astype(p.dtype.newbyteorder("<")).tobytes()

        # data blocks
        blocks, counts = [], []
        if tile is None:
            blocks.append(packer(p))
            counts.append(len(blocks[0]))
        else:
            tl, tw = tile
            for r0 in range(0, height, tl):
                for c0 in range(0, width, tw):
                    t_ = np.zeros((tl, tw), p.dtype)
                    sub = p[r0:r0 + tl, c0:c0 + tw]
                    t_[: sub.shape[0], : sub.shape[1]] = sub
                    blocks.append(packer(t_))
                    counts.append(len(blocks[-1]))
        offsets = []
        for b in blocks:
            offsets.append(len(out))
            out.extend(b)

        def entry(tag, typ, vals):
            cnt = len(vals)
            fmtc = _TYPE_FMT[typ]
            size = _TYPE_SIZE[typ] * cnt
            raw = struct.pack("<" + str(cnt) + fmtc, *vals)
            if size <= 4:
                return struct.pack("<HHI", tag, typ, cnt) + raw.ljust(4, b"\0")
            ptr = len(out)
            out.extend(raw)
            return struct.pack("<HHII", tag, typ, cnt, ptr)

        entries = [
            entry(W, 4, [width]), entry(H, 4, [height]),
            entry(BPS, 3, [bps]), entry(COMP, 3, [1]),
            entry(FILL_ORDER, 3, [fill_order]),
            entry(SPP, 3, [1]), entry(FMT, 3, [fmt]),
        ]
        if tile is None:
            entries += [entry(STRIP_OFF, 4, offsets),
                        entry(ROWS_PER_STRIP, 4, [height]),
                        entry(STRIP_CNT, 4, counts)]
        else:
            entries += [entry(TILE_W, 4, [tile[1]]), entry(TILE_L, 4, [tile[0]]),
                        entry(TILE_OFF, 4, offsets), entry(TILE_CNT, 4, counts)]
        entries.sort(key=lambda e: struct.unpack("<H", e[:2])[0])

        ifd_pos = len(out)
        struct.pack_into("<I", out, ifd_ptr_pos, ifd_pos)
        out.extend(struct.pack("<H", len(entries)))
        for e in entries:
            out.extend(e)
        ifd_ptr_pos = len(out)
        out.extend(b"\x00\x00\x00\x00")  # next-IFD pointer (patched or 0)

    with open(path, "wb") as f:
        f.write(bytes(out))
