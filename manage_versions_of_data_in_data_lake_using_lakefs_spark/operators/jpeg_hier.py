"""Hierarchical JPEG (T.81 Annex J): DHP frame pyramids, EXP
reference expansion, differential DCT frames (SOF5).

The LAST JPEG process family (r11 — after baseline/extended/
progressive/arithmetic/lossless landed, only hierarchical remained a
loud refusal): a hierarchical stream is a SEQUENCE of frames under one
DHP header — a non-differential first frame establishes each
component's reference at reduced (or full) resolution, EXP markers
expand the reference by 2 per axis through the (a + b + 1) >> 1
interpolation filter (horizontal pass then vertical pass, edges
replicated, the doubled output cropped to the next frame's declared
dimensions), and differential frames (SOF5: differential sequential
DCT, Huffman) add IDCT'd corrections — DC coded WITHOUT prediction
(PRED = 0 per J.1.1.3), values signed, no level shift — to the
reference. The final reference planes, at the DHP-declared dimensions,
are the decoded image.

Certification strategy: the general IDCT is float (numpy basis
product, round-half-even to integers — deterministic for this
implementation but not mandated bit-exact by T.81, which is exactly
why third-party hierarchical interop is inherently approximate and the
process is rare). The registered fixture therefore uses DC-ONLY blocks
whose dequantized DC values are multiples of 8: IDCT of a DC-only
block is DC/8 uniformly — EXACT in binary floating point — so every
decoded sample is a pure integer function of (id, x, y) that a SQL
oracle replays end-to-end INCLUDING the expansion filter (integer
shifts and parity CASEs). Arbitrary-coefficient streams are certified
by roundtrip against the encoder's own reference reconstruction (the
shared integer pipeline), pinned in tests/test_jpeg_hier.py.

Honest boundaries (loud): Huffman differential sequential (SOF5) only
— differential progressive/lossless (SOF6/SOF7) and the arithmetic
hierarchical frames (SOF13-15) raise NotImplementedError; 1x1 sampling
and 8-bit precision only; one scan per frame.

Scale shape: map-only ``mapInPandas`` — payloads never shuffle, one
narrow stats row per image (the module family's standing plan).

All worker-side functions are built inside factories so cloudpickle
ships them BY VALUE (tests/test_worker_pickling.py's codebase rule).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def _make_jpeg_hier_codec():
    """Factory returning (encode_jpeg_hier, decode_jpeg_hier,
    reconstruct_hier). ``reconstruct_hier`` is the encoder-side integer
    reference pipeline (same IDCT + expansion as the decoder) used by
    the roundtrip tests as ground truth."""

    ZZ = [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ]

    def _ceil_div(a: int, b: int) -> int:
        return -(-a // b)

    def _seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker, (len(payload) + 2) >> 8,
                      (len(payload) + 2) & 0xFF]) + payload

    # ---- Huffman plumbing (canonical codes, stuffed bit IO) ------------

    class _BitWriter:
        def __init__(self):
            self.buf = bytearray()
            self.acc = 0
            self.n = 0

        def put(self, value: int, n: int) -> None:
            self.acc = (self.acc << n) | (value & ((1 << n) - 1))
            self.n += n
            while self.n >= 8:
                self.n -= 8
                b = (self.acc >> self.n) & 0xFF
                self.buf.append(b)
                if b == 0xFF:
                    self.buf.append(0x00)
            self.acc &= (1 << self.n) - 1

        def flush(self) -> bytes:
            if self.n:
                pad = 8 - self.n
                self.put((1 << pad) - 1, pad)
            return bytes(self.buf)

    class _BitReader:
        def __init__(self, data: bytes):
            self.data = data
            self.i = 0
            self.acc = 0
            self.n = 0

        def bit(self) -> int:
            if self.n == 0:
                if self.i >= len(self.data):
                    raise ValueError("JPEG hier: bit reader ran dry")
                b = self.data[self.i]
                self.i += 1
                if b == 0xFF:
                    if self.i < len(self.data) and self.data[self.i] == 0x00:
                        self.i += 1
                    else:
                        raise ValueError(
                            "JPEG hier: marker inside entropy data"
                        )
                self.acc = b
                self.n = 8
            self.n -= 1
            return (self.acc >> self.n) & 1

        def bits(self, n: int) -> int:
            v = 0
            for _ in range(n):
                v = (v << 1) | self.bit()
            return v

    def _canonical_codes(bits, vals):
        codes = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                codes[vals[k]] = (code, length)
                code += 1
                k += 1
            code <<= 1
        return codes

    def _invert(codes):
        return {(ln, code): sym for sym, (code, ln) in codes.items()}

    # fixed flat tables: DC categories 0..15 and AC run/size symbols —
    # all length-8 canonical codes keep Kraft under 1 and never form
    # the all-ones code of their length with <= 177 symbols
    _DC_VALS = list(range(16))
    _DC_BITS = [0, 0, 0, 0, 16] + [0] * 11  # 16 syms at length 5
    _AC_VALS = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    _AC_BITS = [0] * 7 + [len(_AC_VALS)] + [0] * 8  # all at length 8

    def _extend(v: int, s: int) -> int:
        if s == 0:
            return 0
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    def _category(v: int) -> int:
        return abs(v).bit_length()

    def _read_sym(br, table) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.bit()
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG hier: invalid Huffman code")

    # ---- integer reference pipeline ------------------------------------

    def _idct_samples(blk, q, level_shift):
        """Dequantize + IDCT one block to an 8x8 integer sample tile
        (round half to even, float64 basis — exact for DC-only blocks
        whose dequantized DC is a multiple of 8)."""
        import numpy as np

        coefs = [blk[k] * q[k] for k in range(64)]
        if all(c == 0 for c in coefs[1:]):
            # exact closed form (the certified path): DC/8 per sample
            v = coefs[0] / 8.0
            tile = np.full((8, 8), v)
        else:
            n = np.arange(8)
            c = np.where(n == 0, 1.0 / np.sqrt(2.0), 1.0)
            basis = (
                c[:, None]
                * np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
                / 2
            )
            y = np.asarray(coefs, dtype=np.float64).reshape(8, 8)
            tile = basis.T @ y @ basis
        out = np.rint(tile + level_shift).astype(np.int64)
        return out

    def _assemble(blocks, bw, bh, w, h, q, level_shift):
        """Raster DC-coefficient blocks → integer sample plane (h, w)."""
        import numpy as np

        plane = np.zeros((bh * 8, bw * 8), dtype=np.int64)
        for b, blk in enumerate(blocks):
            by, bx = divmod(b, bw)
            plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = _idct_samples(
                blk, q, level_shift
            )
        return plane[:h, :w]

    def _expand(plane, out_w, out_h):
        """T.81 J.1.1.2 reference expansion by 2 per axis: horizontal
        pass then vertical pass of (a + b + 1) >> 1 with edge
        replication; the doubled output is cropped to (out_h, out_w)."""
        import numpy as np

        h, w = plane.shape
        if not (2 * w >= out_w > 2 * (w - 1) and 2 * h >= out_h > 2 * (h - 1)):
            raise ValueError(
                f"JPEG hier: EXP target {out_w}x{out_h} is not a 2x "
                f"expansion of {w}x{h}"
            )
        wide = np.empty((h, 2 * w), dtype=np.int64)
        wide[:, 0::2] = plane
        right = np.concatenate([plane[:, 1:], plane[:, -1:]], axis=1)
        wide[:, 1::2] = (plane + right + 1) >> 1
        tall = np.empty((2 * h, 2 * w), dtype=np.int64)
        tall[0::2, :] = wide
        below = np.concatenate([wide[1:, :], wide[-1:, :]], axis=0)
        tall[1::2, :] = (wide + below + 1) >> 1
        return tall[:out_h, :out_w]

    # ---- encoder --------------------------------------------------------

    def encode_jpeg_hier(
        frames: list[tuple[str, int, int, list[list[list[int]]]]],
        width: int,
        height: int,
        quant: list[int] | None = None,
    ) -> bytes:
        """REAL hierarchical (Annex J) JPEG bytes from QUANTIZED
        coefficient frames. ``frames`` is an ordered list of
        ``(kind, fw, fh, comps)`` with kind 'full' (non-differential
        SOF0 frame, establishes the reference) or 'diff' (SOF5
        differential frame; if its dimensions double the current
        reference's, an EXP marker is emitted first). ``comps`` is the
        by-now-standard [component][raster block][64 natural-order
        quantized ints] layout, 1x1 sampling. The last frame must land
        on the DHP-declared (width, height)."""
        if not frames or frames[0][0] != "full":
            raise ValueError(
                "JPEG hier: the first frame must be non-differential"
            )
        ncomp = len(frames[0][3])
        q = list(quant) if quant else [1] * 64
        dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
        ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)

        out = bytearray(b"\xff\xd8")
        out += _seg(0xDB, b"\x00" + bytes(q[ZZ[k]] for k in range(64)))
        out += _seg(0xC4, bytes([0x00] + _DC_BITS + _DC_VALS))
        out += _seg(0xC4, bytes([0x10] + _AC_BITS) + bytes(_AC_VALS))
        dhp = bytearray([8, height >> 8, height & 0xFF,
                         width >> 8, width & 0xFF, ncomp])
        for ci in range(ncomp):
            dhp += bytes([ci + 1, 0x11, 0])
        out += _seg(0xDE, bytes(dhp))  # DHP

        cur_w = cur_h = None
        for kind, fw, fh, comps in frames:
            if len(comps) != ncomp:
                raise ValueError("JPEG hier: component count drift")
            if kind == "diff":
                if (cur_w, cur_h) != (fw, fh):
                    out += _seg(0xDF, bytes([0x11]))  # EXP: Eh=Ev=1
            sof = bytearray([8, fh >> 8, fh & 0xFF, fw >> 8, fw & 0xFF,
                             ncomp])
            for ci in range(ncomp):
                sof += bytes([ci + 1, 0x11, 0])
            out += _seg(0xC0 if kind == "full" else 0xC5, bytes(sof))
            sos = bytearray([ncomp])
            for ci in range(ncomp):
                sos += bytes([ci + 1, 0x00])
            sos += bytes([0, 63, 0])
            out += _seg(0xDA, bytes(sos))
            bwr = _BitWriter()
            pred = [0] * ncomp
            nblk = _ceil_div(fw, 8) * _ceil_div(fh, 8)
            for m in range(nblk):
                for ci in range(ncomp):
                    blk = comps[ci][m]
                    diff = blk[0] - (pred[ci] if kind == "full" else 0)
                    if kind == "full":
                        pred[ci] = blk[0]
                    s = _category(diff)
                    code, ln = dc_codes[s]
                    bwr.put(code, ln)
                    if s:
                        bwr.put(diff if diff >= 0 else diff - 1, s)
                    ke = 63
                    while ke > 0 and blk[ZZ[ke]] == 0:
                        ke -= 1
                    k = 1
                    while k <= ke:
                        run = 0
                        while blk[ZZ[k]] == 0:
                            run += 1
                            k += 1
                        while run >= 16:
                            code, ln = ac_codes[0xF0]
                            bwr.put(code, ln)
                            run -= 16
                        v = blk[ZZ[k]]
                        s = _category(v)
                        code, ln = ac_codes[(run << 4) | s]
                        bwr.put(code, ln)
                        bwr.put(v if v >= 0 else v - 1, s)
                        k += 1
                    if k <= 63:
                        code, ln = ac_codes[0x00]
                        bwr.put(code, ln)
            out += bwr.flush()
            cur_w, cur_h = fw, fh
        if (cur_w, cur_h) != (width, height):
            raise ValueError(
                f"JPEG hier: final frame is {cur_w}x{cur_h}, DHP "
                f"declares {width}x{height}"
            )
        out += b"\xff\xd9"
        return bytes(out)

    def reconstruct_hier(frames, width, height, quant=None):
        """The encoder-side integer reference pipeline: what a
        conforming decode of ``encode_jpeg_hier(frames, ...)`` must
        produce (shared IDCT/rounding/expansion)."""
        q = list(quant) if quant else [1] * 64
        ncomp = len(frames[0][3])
        refs = [None] * ncomp
        for kind, fw, fh, comps in frames:
            bw, bh = _ceil_div(fw, 8), _ceil_div(fh, 8)
            for ci in range(ncomp):
                add = _assemble(
                    comps[ci], bw, bh, fw, fh, q,
                    128 if kind == "full" else 0,
                )
                if kind == "full":
                    refs[ci] = add
                else:
                    ref = refs[ci]
                    if ref.shape != (fh, fw):
                        ref = _expand(ref, fw, fh)
                    refs[ci] = ref + add
        return [
            [int(v) for v in r[:height, :width].reshape(-1)] for r in refs
        ]

    # ---- decoder --------------------------------------------------------

    def decode_jpeg_hier(p: bytes):
        """Decode a hierarchical (DHP) JPEG to (width, height, ncomp,
        planes) with planes = exact integer samples in raster order per
        component (the accumulated reference at DHP dimensions)."""
        if p[:2] != b"\xff\xd8":
            raise ValueError("JPEG: missing SOI")
        i = 2
        quants: dict[int, list[int]] = {}
        huff: dict[tuple[int, int], dict] = {}
        dhp = None  # (w, h, ncomp)
        refs = None
        pending_exp = False
        frame = None  # (kind, fw, fh, comps_spec)
        while i + 2 <= len(p):
            if p[i] != 0xFF:
                raise ValueError(f"JPEG: expected marker at {i}")
            marker = p[i + 1]
            if marker == 0xFF:
                i += 1
                continue
            if marker == 0xD9:
                break
            if i + 4 > len(p):
                raise ValueError("JPEG hier: truncated marker segment")
            seg_len = int.from_bytes(p[i + 2 : i + 4], "big")
            body = p[i + 4 : i + 2 + seg_len]
            if marker == 0xDB:
                j = 0
                while j < len(body):
                    pq, tq = body[j] >> 4, body[j] & 0x0F
                    j += 1
                    tbl = [0] * 64
                    if pq:
                        if j + 128 > len(body):
                            raise ValueError(
                                "JPEG: truncated 16-bit DQT segment"
                            )
                        for k in range(64):
                            tbl[ZZ[k]] = int.from_bytes(
                                body[j + 2 * k : j + 2 * k + 2], "big"
                            )
                        j += 128
                    else:
                        for k in range(64):
                            tbl[ZZ[k]] = body[j + k]
                        j += 64
                    quants[tq] = tbl
            elif marker == 0xC4:
                j = 0
                while j < len(body):
                    tc, th = body[j] >> 4, body[j] & 0x0F
                    bits = list(body[j + 1 : j + 17])
                    n = sum(bits)
                    vals = list(body[j + 17 : j + 17 + n])
                    huff[(tc, th)] = _invert(_canonical_codes(bits, vals))
                    j += 17 + n
            elif marker == 0xDE:  # DHP
                if body[0] != 8:
                    raise NotImplementedError(
                        "JPEG hier: only 8-bit precision supported"
                    )
                h = int.from_bytes(body[1:3], "big")
                w = int.from_bytes(body[3:5], "big")
                nc = body[5]
                for ci in range(nc):
                    if body[7 + 3 * ci] != 0x11:
                        raise NotImplementedError(
                            "JPEG hier: subsampled frames unsupported "
                            "(1x1 only)"
                        )
                dhp = (w, h, nc)
                refs = [None] * nc
            elif marker == 0xDD:
                if int.from_bytes(body[0:2], "big"):
                    raise NotImplementedError(
                        "JPEG hier: restart intervals unsupported"
                    )
            elif marker == 0xDF:  # EXP
                if body[0] != 0x11:
                    raise NotImplementedError(
                        "JPEG hier: only Eh=Ev=1 expansion supported"
                    )
                pending_exp = True
            elif marker in (0xC0, 0xC1, 0xC5):
                if dhp is None:
                    raise ValueError("JPEG hier: frame before DHP")
                if body[0] != 8:
                    raise NotImplementedError(
                        "JPEG hier: only 8-bit precision supported"
                    )
                fh = int.from_bytes(body[1:3], "big")
                fw = int.from_bytes(body[3:5], "big")
                nc = body[5]
                if nc != dhp[2]:
                    raise NotImplementedError(
                        "JPEG hier: partial-component frames unsupported"
                    )
                spec = []
                for ci in range(nc):
                    if body[7 + 3 * ci] != 0x11:
                        raise NotImplementedError(
                            "JPEG hier: subsampled frames unsupported"
                        )
                    spec.append((body[6 + 3 * ci], body[8 + 3 * ci]))
                frame = ("full" if marker != 0xC5 else "diff", fw, fh, spec)
            elif marker in (0xC2, 0xC3, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                            0xCD, 0xCE, 0xCF):
                raise NotImplementedError(
                    f"JPEG hier: SOF{marker - 0xC0} frames unsupported "
                    f"(non-differential SOF0/SOF1 + differential SOF5)"
                )
            elif marker == 0xDA:
                if frame is None:
                    raise ValueError("JPEG hier: SOS before SOF")
                kind, fw, fh, spec = frame
                ns = body[0]
                if ns != len(spec):
                    raise NotImplementedError(
                        "JPEG hier: partial-component scans unsupported"
                    )
                tabs = []
                for c in range(ns):
                    tt = body[2 + 2 * c]
                    tabs.append((tt >> 4, tt & 0x0F))
                # decode the scan
                scan_at = i + 2 + seg_len
                # entropy runs to the next real marker (no restarts)
                j = scan_at
                while j + 1 < len(p):
                    if p[j] == 0xFF and p[j + 1] != 0x00:
                        break
                    j += 1
                br = _BitReader(p[scan_at:j])
                ncomp = len(spec)
                bw, bh = _ceil_div(fw, 8), _ceil_div(fh, 8)
                pred = [0] * ncomp
                comps = [[] for _ in range(ncomp)]
                for _m in range(bw * bh):
                    for ci in range(ncomp):
                        dct = huff[(0, tabs[ci][0])]
                        act = huff[(1, tabs[ci][1])]
                        blk = [0] * 64
                        s = _read_sym(br, dct)
                        d = _extend(br.bits(s), s)
                        if kind == "full":
                            pred[ci] += d
                            blk[0] = pred[ci]
                        else:  # differential: PRED = 0 (J.1.1.3)
                            blk[0] = d
                        k = 1
                        while k < 64:
                            sym = _read_sym(br, act)
                            if sym == 0x00:
                                break
                            if sym == 0xF0:
                                k += 16
                                continue
                            run, s = sym >> 4, sym & 0x0F
                            k += run
                            if k > 63:
                                raise ValueError(
                                    "JPEG hier: AC run past block end"
                                )
                            blk[ZZ[k]] = _extend(br.bits(s), s)
                            k += 1
                        comps[ci].append(blk)
                # fold the frame into the reference
                for ci in range(ncomp):
                    q = quants[spec[ci][1]]
                    add = _assemble(
                        comps[ci], bw, bh, fw, fh, q,
                        128 if kind == "full" else 0,
                    )
                    if kind == "full":
                        refs[ci] = add
                    else:
                        ref = refs[ci]
                        if ref is None:
                            raise ValueError(
                                "JPEG hier: differential frame before "
                                "any reference"
                            )
                        if ref.shape != (fh, fw) and not pending_exp:
                            raise ValueError(
                                "JPEG hier: differential frame dims "
                                f"{fw}x{fh} differ from the reference's "
                                f"{ref.shape[1]}x{ref.shape[0]} without a "
                                "preceding EXP marker (T.81 Annex J)"
                            )
                        if pending_exp:
                            ref = _expand(ref, fw, fh)
                        refs[ci] = ref + add
                pending_exp = False
                frame = None
                i = j
                continue
            i += 2 + seg_len
        if dhp is None or refs is None or any(r is None for r in refs):
            raise ValueError("JPEG hier: missing DHP or frames")
        w, h, nc = dhp
        for r in refs:
            if r.shape != (h, w):
                raise ValueError(
                    f"JPEG hier: final reference is {r.shape[1]}x"
                    f"{r.shape[0]}, DHP declares {w}x{h}"
                )
        planes = [[int(v) for v in r.reshape(-1)] for r in refs]
        return w, h, nc, planes

    return encode_jpeg_hier, decode_jpeg_hier, reconstruct_hier


# ---- fixture + DataFrame plumbing ---------------------------------------


def _make_synth_jpeg_hier():
    """Deterministic hierarchical JPEG per id — a two-level pyramid
    whose every decoded sample is a pure integer function of (id, c,
    x, y), because all blocks are DC-ONLY with dequantized DC values
    that are multiples of 8 (exact IDCT — see module docstring):

      full dims w = 10 + id % 12, h = 6 + id % 9; half dims
      hw = ceil(w/2), hh = ceil(h/2); grayscale if id % 2 = 0 else 3
      components. Frame 1 (SOF0, half res): block (bx, by) of
      component c holds DC = 8·a where
      a(id,c,bx,by) = (id + 5·c + 11·bx + 17·by) % 120 − 60, so the
      half-res sample is 128 + a. EXP, then frame 2 (SOF5, full res):
      DC = 8·b with b(id,c,bx,by) = (id + 3·c + 7·bx + 13·by) % 9 − 4.
      Decoded sample = expand(half)(x, y) + b(id, c, x//8, y//8),
      where expand is the (a+b+1)>>1 H-then-V filter — all integers,
      all SQL-expressible."""
    enc, _, _ = _make_jpeg_hier_codec()

    def build(i: int) -> bytes:
        w, h = 10 + i % 12, 6 + i % 9
        hw, hh = -(-w // 2), -(-h // 2)
        ncomp = 1 if i % 2 == 0 else 3

        def dc_frame(fw, fh, val):
            bw, bh = -(-fw // 8), -(-fh // 8)
            comps = []
            for c in range(ncomp):
                blocks = []
                for b in range(bw * bh):
                    by, bx = divmod(b, bw)
                    blk = [0] * 64
                    blk[0] = 8 * val(c, bx, by)
                    blocks.append(blk)
                comps.append(blocks)
            return comps

        # half-res sample = 128 (level shift) + a, a in [-60, 59]
        half = dc_frame(
            hw, hh,
            lambda c, bx, by: (i + 5 * c + 11 * bx + 17 * by) % 120 - 60,
        )
        full = dc_frame(
            w, h, lambda c, bx, by: (i + 3 * c + 7 * bx + 13 * by) % 9 - 4
        )
        return enc(
            [("full", hw, hh, half), ("diff", w, h, full)], w, h
        )

    return build


def synthesize_jpeg_hier_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic REAL hierarchical JPEGs from an id column."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.multimodal import MEDIA_SCHEMA

    build = _make_synth_jpeg_hier()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "kind": ["image"] * len(pdf),
                    "payload": [build(int(i)) for i in pdf[id_col]],
                    "meta": [None] * len(pdf),
                }
            )

    return ids.mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_jpeg_hier_stats(media: DataFrame) -> DataFrame:
    """Hierarchical decode → per-image exact sample statistics (the
    lossless stats row shape: position- and component-weighted checksum
    included). Map-only ``mapInPandas``."""
    from manage_versions_of_data_in_data_lake_using_lakefs_spark.operators.jpeg_arith import LOSSLESS_STATS_SCHEMA

    _, decode, _ = _make_jpeg_hier_codec()

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in LOSSLESS_STATS_SCHEMA.fields}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                w, h, nc, planes = decode(bytes(p))
                flat = [v for pl in planes for v in pl]
                wsum = 0
                for c, pl in enumerate(planes):
                    for j, v in enumerate(pl):
                        y, x = divmod(j, w)
                        wsum += v * (1 + (x + 2 * y + 3 * c) % 5)
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["n_components"].append(nc)
                out["n_samples"].append(len(flat))
                out["px_sum"].append(sum(flat))
                out["px_wsum"].append(wsum)
                out["px_min"].append(min(flat))
                out["px_max"].append(max(flat))
            yield pd.DataFrame(out)

    return media.mapInPandas(stats, schema=LOSSLESS_STATS_SCHEMA)
