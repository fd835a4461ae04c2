"""Pure-stdlib baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

The media lane's PNG decoder covers the lossless container family;
this module adds the LOSSY one a crawled corpus actually carries —
a real baseline (SOF0) sequential DCT decoder: marker parse, DQT
(8/16-bit) and DHT (canonical Huffman) tables, interleaved-MCU
entropy decode with byte-stuffing and restart markers, differential
DC prediction, zigzag dequantization, float IDCT, sampling-factor
plane assembly, and crop. VERDICT r10 ask #5.

Determinism contract with the DuckDB twins: decoded pixels must be
EXACTLY predictable from the generating formula without running a
decoder in SQL. Lossy codecs break that in general, so the synthetic
corpus (:func:`synthesize_jpeg`) is built at the codec's fixed
point — every 8x8 block is FLAT at an even gray level g, whose DCT
is DC-only with S00 = 8*(g-128); under the Annex-K luminance table
(DC quant 16) the coefficient (g-128)/2 is integral, and the IDCT of
a DC-only block is flat at S00/8 = g again. Quantize -> dequantize ->
IDCT -> round round-trips bit-exactly however the float IDCT
parenthesizes (the 1e-16 basis noise cannot move an integer across
a rounding boundary), so the oracle's pixel formula IS the decoded
plane. The AC/zigzag/run-length paths fall outside the fixed point
and are pinned by pytest against an independently coded reference
IDCT instead (tests/test_multimodal.py) — the same split as the PNG
matrix (gates pin the luma-invariant classes, the encoder-fixture
matrix pins everything else).

Reference parity note: the reference pipeline treats media blobs as
opaque payloads with typed metadata (SURVEY.md multimodal lane);
decoders are this repo's LLM-corpus extension, not a reference
operator.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Spec constants (ITU-T T.81 Annex K — the standard example tables)

#: Zigzag scan order: ZIGZAG[i] = natural-order index of the i-th
#: zigzag coefficient.
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: Annex K.1 luminance quantization table (natural order), Q50. The
#: DC entry 16 is what makes the flat-block fixed point exact.
QTABLE_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

#: Annex K.2 chrominance quantization table (natural order).
QTABLE_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3 Huffman tables: (BITS[1..16] code-length counts, HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _canonical_codes(bits: list[int]) -> list[tuple[int, int]]:
    """(code, length) pairs in symbol order from the 16 length
    counts — T.81 C.2's canonical code construction."""
    out = []
    code = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out.append((code, ln))
            code += 1
        code <<= 1
    return out


def _enc_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    return dict(zip(vals, _canonical_codes(bits)))


def _dec_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    return {
        (ln, code): sym
        for sym, (code, ln) in zip(vals, _canonical_codes(bits))
    }


#: The float IDCT basis: A[u, x] = C(u)/2 * cos((2x+1) u pi / 16);
#: IDCT(S) = A^T @ S @ A. Precomputed once — every block is two
#: 8x8 matmuls.
_IDCT_A = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def idct_2d(block: np.ndarray) -> np.ndarray:
    """Float 8x8 inverse DCT (T.81 A.3.3) of a NATURAL-ORDER
    coefficient block; output is the spatial block BEFORE level
    shift."""
    return _IDCT_A.T @ block @ _IDCT_A


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._acc)
                if self._acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self._acc = 0
                self._n = 0

    def pad_to_byte(self) -> None:
        """1-fill to the byte boundary (T.81 F.1.2.3)."""
        while self._n:
            self.write(1, 1)


class _BitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, stops AT any
    other marker (the caller handles RSTn / EOI)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def at_marker(self) -> int | None:
        """The marker byte if the reader sits at an 0xFFxx (xx != 0)
        boundary, else None."""
        if (
            self._n == 0
            and self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and self.data[self.pos + 1] != 0x00
        ):
            return self.data[self.pos + 1]
        return None

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated entropy stream")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated entropy stream")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed FF
            else:
                # a real marker inside entropy data: the stream lied
                raise ValueError("truncated entropy stream")
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self._acc = 0
        self._n = 0


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, ln = 0, 0
    while ln <= 16:
        code = (code << 1) | reader.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code")


def _extend(v: int, ssss: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the SSSS magnitude bits to a signed
    coefficient."""
    if ssss == 0:
        return 0
    return v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1


def _category(v: int) -> int:
    """SSSS of a coefficient/DC-diff (bit length of |v|)."""
    return abs(v).bit_length()


# ---------------------------------------------------------------------------
# Decoder


def decode_jpeg(payload: bytes) -> dict:
    """Decode a baseline (SOF0) JPEG. Returns ``{"width", "height",
    "n_components", "luma"}`` with ``luma`` the cropped uint8 Y
    plane (for 1-component images, the single plane) — the stats
    consumers downstream are luma-based, and the synthetic corpus
    keeps chroma neutral so luma IS the image (module docstring).

    Failure messages are deterministic per failure family — the
    permissive-mode gates replay them verbatim:
    ``not a JPEG: bad signature`` / ``unsupported precision P`` /
    ``truncated entropy stream`` / ``truncated segment header`` /
    ``invalid progressive spectral range`` / ``invalid successive
    approximation sequence`` / ``unsupported marker SOFn``.
    (Progressive SOF2 streams decode for real since r12; the
    mislabeled-SOF2 poison family raises the spectral-range message.)
    """
    if len(payload) < 2 or payload[0] != 0xFF or payload[1] != 0xD8:
        raise ValueError("not a JPEG: bad signature")
    pos = 2
    qtables: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    progressive = False
    prog_coeffs = None  # comp id -> (pbh, pbw, 64) accumulated coeffs
    prog_geom: dict = {}  # comp id -> sampling + real block grid
    prog_dc_done: set = set()  # component ids with their DC landed
    prog_al_state: dict = {}  # (comp id, k) -> current Al

    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            break
        seg_len = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
        seg = payload[pos + 4 : pos + 2 + seg_len]
        if len(seg) != seg_len - 2:
            # the slice silently shortens on a truncated payload and
            # every downstream seg[i] would raise a raw IndexError —
            # surface the one deterministic errors-as-data message
            # instead (found by a truncation sweep over progressive
            # streams; applies uniformly to every marker segment)
            raise ValueError("truncated segment header")
        pos += 2 + seg_len
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    vals = list(seg[i : i + 64])
                    i += 64
                else:
                    vals = [
                        struct.unpack(">H", seg[i + 2 * j : i + 2 * j + 2])[0]
                        for j in range(64)
                    ]
                    i += 128
                nat = [0] * 64
                for zz, v in enumerate(vals):
                    nat[ZIGZAG[zz]] = v
                qtables[tq] = nat
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                i += 17 + n
                tbl = _dec_table(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = tbl
        elif marker == 0xC0:  # SOF0 baseline
            precision = seg[0]
            if precision != 8:
                raise ValueError(f"unsupported precision {precision}")
            h, w = struct.unpack(">HH", seg[1:5])
            if h == 0 or w == 0:
                raise ValueError("zero image dimension")
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
        elif marker == 0xC2:
            # Progressive DCT (SOF2) decodes for real over a single
            # component (r12, VERDICT r11 ask #5: progressive is
            # ~6-10% of any web crawl): spectral-selection band
            # scans AND full successive approximation (point-
            # transformed first scans + one-bit refinement scans).
            # The gate argument: a FULLY REFINED stream carries the
            # SAME quantized coefficients as baseline, so the
            # flat-block corpus round-trips and the DuckDB oracle
            # replays the same pixel formula. Interleaved multi-
            # component progressive scans and incoherent Al scan
            # scripts route to the permissive error lane with
            # deterministic messages (see the SOS branch).
            progressive = True
            precision = seg[0]
            if precision != 8:
                raise ValueError(f"unsupported precision {precision}")
            h, w = struct.unpack(">HH", seg[1:5])
            if h == 0 or w == 0:
                raise ValueError("zero image dimension")
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported marker SOF{marker - 0xC0}")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[0:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            if not progressive:
                scan = []
                for c in range(ns):
                    cs, tt = seg[1 + 2 * c : 3 + 2 * c]
                    comp = next(x for x in comps if x["id"] == cs)
                    scan.append(
                        {**comp, "dc": tt >> 4, "ac": tt & 0x0F}
                    )
                return _decode_scan(
                    payload, pos, w, h, scan, qtables, huff_dc, huff_ac,
                    restart_interval, len(comps),
                )
            # progressive: validate the SCAN SHAPE first — spectral
            # range before component count, so a baseline-bodied
            # stream mislabeled SOF2 (the poison fixture) always
            # fails with ONE deterministic message regardless of its
            # component layout (Ss=0/Se=63 is spec-invalid in a
            # progressive frame, T.81 G.1).
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            aa = seg[3 + 2 * ns]
            ah, al = aa >> 4, aa & 0x0F
            if not ((ss == 0 and se == 0) or 1 <= ss <= se <= 63):
                raise ValueError("invalid progressive spectral range")
            if ah and ah != al + 1:
                # refinement scans carry exactly one magnitude bit
                raise ValueError("invalid successive approximation sequence")
            if ss > 0 and ns != 1:
                # T.81 G.1.1.1.1: AC scans are never interleaved
                raise ValueError(
                    "progressive AC scan must be single-component"
                )
            scan_ids = [seg[1 + 2 * c] for c in range(ns)]
            scan_tts = [seg[2 + 2 * c] for c in range(ns)]
            known = {c["id"] for c in comps}
            if any(cid not in known for cid in scan_ids):
                raise ValueError("scan references unknown component")
            if ss == 0:
                for cid in scan_ids:
                    prog_dc_done.add(cid)
            elif scan_ids[0] not in prog_dc_done:
                raise ValueError("AC scan before DC scan")
            # per-(component, coefficient) Al state machine: a first
            # scan (Ah=0) must be the coefficient's first sighting; a
            # refinement must continue exactly where the previous
            # scan left off — otherwise shifted bits would silently
            # land at the wrong magnitude (wrong pixels, no error).
            for cid in scan_ids:
                for k in range(ss, se + 1):
                    st = prog_al_state.get((cid, k))
                    if ah == 0:
                        if st is not None:
                            raise ValueError(
                                "invalid successive approximation sequence"
                            )
                    elif st != ah:
                        raise ValueError(
                            "invalid successive approximation sequence"
                        )
                    prog_al_state[(cid, k)] = al
            if prog_coeffs is None:
                # per-component geometry (T.81 A.1.1/A.2.4): the MCU
                # grid sizes the PADDED block plane (interleaved DC
                # scans cover padding blocks), while non-interleaved
                # AC scans raster only the component's REAL block
                # grid — ceil of its scaled dimensions
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = (w + 8 * hmax - 1) // (8 * hmax)
                mcuy = (h + 8 * vmax - 1) // (8 * vmax)
                prog_coeffs = {}
                prog_geom = {}
                for c in comps:
                    cw = (w * c["h"] + hmax - 1) // hmax
                    ch2 = (h * c["v"] + vmax - 1) // vmax
                    pbw, pbh = c["h"] * mcux, c["v"] * mcuy
                    prog_coeffs[c["id"]] = np.zeros(
                        (pbh, pbw, 64), dtype=np.int64
                    )
                    prog_geom[c["id"]] = {
                        "h": c["h"], "v": c["v"],
                        "bw": (cw + 7) // 8, "bh": (ch2 + 7) // 8,
                    }
            reader = _BitReader(payload, pos)
            if ss == 0 and ns > 1:
                # interleaved DC scan: blocks in MCU order, padding
                # blocks included (T.81 A.2.3)
                _prog_dc_interleaved(
                    reader,
                    [prog_coeffs[cid] for cid in scan_ids],
                    ah,
                    al,
                    [huff_dc.get(tt >> 4) for tt in scan_tts],
                    [
                        (prog_geom[cid]["h"], prog_geom[cid]["v"])
                        for cid in scan_ids
                    ],
                    restart_interval=restart_interval,
                )
            else:
                tt = scan_tts[0]
                g = prog_geom[scan_ids[0]]
                _prog_scan(
                    reader, prog_coeffs[scan_ids[0]], ss, se, ah, al,
                    huff_dc.get(tt >> 4), huff_ac.get(tt & 0x0F),
                    bh_lim=g["bh"], bw_lim=g["bw"],
                    restart_interval=restart_interval,
                )
            pos = reader.pos
            # resync to the next marker (the scan's last partial byte
            # was already consumed; padding bits may remain)
            while pos + 1 < len(payload) and not (
                payload[pos] == 0xFF and payload[pos + 1] != 0x00
            ):
                pos += 1
        # APPn / COM / anything else: skipped by the length field
    if progressive and prog_coeffs is not None and prog_dc_done:
        # features are luma-based (module docstring): reconstruct the
        # FIRST component's plane (upsampled to full resolution when
        # it is subsampled — the baseline path's convention); chroma
        # scans were fully entropy-decoded above (stream validated),
        # their IDCT is skipped
        c0 = comps[0]
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        return _prog_reconstruct(
            prog_coeffs[c0["id"]], w, h, qtables[c0["tq"]],
            n_components=len(comps),
            repeat=(vmax // c0["v"], hmax // c0["h"]),
        )
    raise ValueError("no SOS marker")


def _decode_scan(
    payload, pos, w, h, scan, qtables, huff_dc, huff_ac,
    restart_interval, n_components,
):
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {}
    for c in scan:
        pw, ph = 8 * c["h"] * mcux, 8 * c["v"] * mcuy
        planes[c["id"]] = np.zeros((ph, pw), dtype=np.float64)
    reader = _BitReader(payload, pos)
    pred = {c["id"]: 0 for c in scan}
    mcu_count = 0
    rst_expect = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align()
                m = reader.at_marker()
                if m is None and reader.pos + 1 >= len(reader.data):
                    # end of data where a restart belongs: the stream
                    # is short for the declared dims — same failure
                    # family (and message) as running dry mid-MCU
                    raise ValueError("truncated entropy stream")
                if m == 0xD9:
                    raise ValueError("truncated entropy stream")
                if m is None or not (0xD0 <= m <= 0xD7):
                    raise ValueError("missing restart marker")
                if m - 0xD0 != rst_expect:
                    raise ValueError("restart marker out of sequence")
                reader.pos += 2
                rst_expect = (rst_expect + 1) % 8
                pred = {c["id"]: 0 for c in scan}
            for c in scan:
                q = qtables[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.float64)
                        ssss = _huff_decode(reader, huff_dc[c["dc"]])
                        diff = _extend(reader.bits(ssss), ssss)
                        pred[c["id"]] += diff
                        coef[0] = pred[c["id"]] * q[0]
                        zz = 1
                        while zz < 64:
                            rs = _huff_decode(reader, huff_ac[c["ac"]])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    zz += 16  # ZRL
                                    continue
                                break  # EOB
                            zz += r
                            if zz > 63:
                                raise ValueError("AC run past block end")
                            coef[ZIGZAG[zz]] = (
                                _extend(reader.bits(s), s) * q[ZIGZAG[zz]]
                            )
                            zz += 1
                        block = idct_2d(coef.reshape(8, 8)) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1
    # luma = first scan component, upsampled to full resolution then
    # cropped (neutral-chroma corpus: luma IS the image)
    c0 = scan[0]
    plane = planes[c0["id"]]
    ry, rx = vmax // c0["v"], hmax // c0["h"]
    if ry > 1 or rx > 1:
        plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
    luma = np.clip(np.rint(plane[:h, :w]), 0, 255).astype(np.uint8)
    return {
        "width": w,
        "height": h,
        "n_components": n_components,
        "luma": luma,
    }


def _consume_restart(reader: _BitReader, rst_expect: int) -> int:
    """Byte-align and consume the expected RSTn at a restart
    boundary; returns the next expected index. Error messages mirror
    the baseline path's exactly (one deterministic message per
    failure family — running dry here is the same family as running
    dry mid-MCU, T.81 E.2.4 truncation either way)."""
    reader.align()
    m = reader.at_marker()
    if m is None and reader.pos + 1 >= len(reader.data):
        raise ValueError("truncated entropy stream")
    if m == 0xD9:
        raise ValueError("truncated entropy stream")
    if m is None or not (0xD0 <= m <= 0xD7):
        raise ValueError("missing restart marker")
    if m - 0xD0 != rst_expect:
        raise ValueError("restart marker out of sequence")
    reader.pos += 2
    return (rst_expect + 1) % 8


def _prog_scan(reader, coeffs, ss, se, ah, al, dc_tbl, ac_tbl,
               bh_lim=None, bw_lim=None, restart_interval=0) -> None:
    """One progressive scan over the single component's blocks in
    raster order — all four T.81 scan kinds:

    - DC first (ss=0, ah=0): baseline DC diff chain on the
      point-transformed values, stored ``<< al`` (G.1.2.1);
    - DC refinement (ss=0, ah>0): one raw bit per block, OR-ed in at
      position ``al`` (works on negatives via two's complement);
    - AC first (ss>0, ah=0): (run,size) codes, ZRL, EOBn runs —
      EOBRUN = (1<<r) - 1 + r appended bits ends the CURRENT block's
      band and skips that many following blocks (G.1.2.2); values
      stored ``<< al`` (sign-magnitude point transform);
    - AC refinement (ss>0, ah>0): the correction-bit scan
      (G.1.2.3) — newly significant coefficients arrive as
      (run, size=1) with a sign bit, every already-nonzero
      coefficient passed on the way (and in the EOB tail) consumes
      one correction bit that may grow its magnitude by ``1 << al``.

    Restart markers (r13): in a non-interleaved scan the MCU is one
    data unit (T.81 A.2.2), so every ``restart_interval`` blocks the
    reader byte-aligns, consumes the in-sequence RSTn, and resets the
    DC predictor AND the EOB run (a conformant encoder flushes its
    EOB run before a restart — E.2.4; libjpeg resets both the same
    way on resync).
    """
    bh_, bw_, _ = coeffs.shape
    if bh_lim is not None:
        bh_, bw_ = bh_lim, bw_lim  # non-interleaved: REAL grid only
    pred = 0
    eobrun = 0
    unit = 0
    rst_expect = 0
    p1, m1 = 1 << al, -1 << al
    for by in range(bh_):
        for bx in range(bw_):
            if restart_interval and unit and unit % restart_interval == 0:
                rst_expect = _consume_restart(reader, rst_expect)
                pred = 0
                eobrun = 0
            unit += 1
            blk = coeffs[by, bx]
            if ss == 0:
                if ah == 0:  # DC first
                    ssss = _huff_decode(reader, dc_tbl)
                    pred += _extend(reader.bits(ssss), ssss)
                    blk[0] = pred << al
                else:  # DC refinement: one magnitude bit
                    if reader.bit():
                        blk[0] |= p1
                continue
            if ah == 0:  # AC first scan
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _huff_decode(reader, ac_tbl)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:
                            k += 16  # ZRL
                            continue
                        eobrun = (1 << r) - 1 + (reader.bits(r) if r else 0)
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC run past band end")
                    blk[ZIGZAG[k]] = _extend(reader.bits(s), s) << al
                    k += 1
                continue
            # AC refinement
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _huff_decode(reader, ac_tbl)
                    r, s = rs >> 4, rs & 0x0F
                    newval = 0
                    if s == 0:
                        if r != 15:
                            # FULL count including the current block:
                            # the EOB tail below processes the current
                            # block's correction bits and decrements
                            # (the first-scan branch instead stores
                            # the REMAINING count — its current block
                            # ends at the break with nothing to read)
                            eobrun = (1 << r) + (
                                reader.bits(r) if r else 0
                            )
                            break
                        # r == 15: ZRL — skip 16 zero-history slots
                    else:
                        if s != 1:
                            raise ValueError(
                                "invalid refinement magnitude"
                            )
                        newval = p1 if reader.bit() else m1
                    # advance r zero-HISTORY positions, correcting
                    # every nonzero coefficient passed on the way
                    while k <= se:
                        z = ZIGZAG[k]
                        if blk[z] != 0:
                            if reader.bit() and (blk[z] & p1) == 0:
                                blk[z] += p1 if blk[z] > 0 else m1
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if newval and k <= se:
                        blk[ZIGZAG[k]] = newval
                    k += 1
            if eobrun:
                # EOB tail of THIS block: correction bits for every
                # remaining nonzero coefficient in the band
                while k <= se:
                    z = ZIGZAG[k]
                    if blk[z] != 0:
                        if reader.bit() and (blk[z] & p1) == 0:
                            blk[z] += p1 if blk[z] > 0 else m1
                    k += 1
                eobrun -= 1


def _prog_dc_interleaved(reader, planes, ah, al, dc_tbls, samplings,
                         restart_interval=0) -> None:
    """Interleaved progressive DC scan over ns components: each MCU
    carries h_i x v_i blocks per component in scan order (padding
    blocks included, T.81 A.2.3) — first scans run per-component
    diff chains on the point-transformed values, refinements one raw
    bit per block. Restart markers every ``restart_interval`` MCUs
    reset all component predictors (r13)."""
    h0, v0 = samplings[0]
    mcuy = planes[0].shape[0] // v0
    mcux = planes[0].shape[1] // h0
    preds = [0] * len(planes)
    mcu_count = 0
    rst_expect = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                rst_expect = _consume_restart(reader, rst_expect)
                preds = [0] * len(planes)
            mcu_count += 1
            for ci, plane in enumerate(planes):
                hi, vi = samplings[ci]
                for byi in range(vi):
                    for bxi in range(hi):
                        blk = plane[my * vi + byi, mx * hi + bxi]
                        if ah == 0:
                            ssss = _huff_decode(reader, dc_tbls[ci])
                            preds[ci] += _extend(
                                reader.bits(ssss), ssss
                            )
                            blk[0] = preds[ci] << al
                        else:
                            if reader.bit():
                                blk[0] |= 1 << al


def _prog_reconstruct(
    coeffs, w, h, q, n_components: int = 1, repeat=(1, 1)
) -> dict:
    """Dequantize + IDCT the accumulated coefficient planes — the
    same reconstruction tail as the baseline path (shared idct_2d),
    run once at EOI when every scan has landed."""
    bh_, bw_, _ = coeffs.shape
    qv = np.array(q, dtype=np.float64)
    plane = np.empty((bh_ * 8, bw_ * 8), dtype=np.float64)
    for by in range(bh_):
        for bx in range(bw_):
            block = idct_2d(
                (coeffs[by, bx].astype(np.float64) * qv).reshape(8, 8)
            ) + 128.0
            plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    ry, rx = repeat
    if ry > 1 or rx > 1:
        plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
    luma = np.clip(np.rint(plane[:h, :w]), 0, 255).astype(np.uint8)
    return {
        "width": w,
        "height": h,
        "n_components": n_components,
        "luma": luma,
    }


# ---------------------------------------------------------------------------
# Encoder (corpus fixture — full enough to write the gate classes
# and the pytest AC matrix)


def encode_baseline(
    planes: list[np.ndarray],
    w: int,
    h: int,
    sampling: list[tuple[int, int]],
    restart_interval: int = 0,
) -> bytes:
    """A real baseline JFIF byte stream: ``planes`` are full-size
    uint8 arrays (chroma planes at their SUBSAMPLED size), one per
    component; ``sampling`` the (h, v) factors per component.
    Grayscale = one plane at (1, 1). Quant/Huffman tables are the
    Annex-K standards (component 0 uses the luma pair, the rest the
    chroma pair)."""
    nc = len(planes)
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"  # APP0
    # DQT (luma always; chroma when nc > 1)
    for tq, nat in ([(0, QTABLE_LUMA)] + ([(1, QTABLE_CHROMA)] if nc > 1 else [])):
        zz = bytes(nat[ZIGZAG[i]] for i in range(64))
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz
    # SOF0
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        hv = (sampling[ci][0] << 4) | sampling[ci][1]
        sof += bytes([ci + 1, hv, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT
    tables = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if nc > 1:
        tables += [
            (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tcth, bits, vals in tables:
        body = bytes([tcth]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    enc_dc = [_enc_table(DC_LUMA_BITS, DC_LUMA_VALS),
              _enc_table(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    enc_ac = [_enc_table(AC_LUMA_BITS, AC_LUMA_VALS),
              _enc_table(AC_CHROMA_BITS, AC_CHROMA_VALS)]
    qnat = [QTABLE_LUMA, QTABLE_CHROMA]
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # pad planes to full MCU coverage by edge replication
    padded = []
    for ci, p in enumerate(planes):
        ph = 8 * sampling[ci][1] * mcuy
        pw = 8 * sampling[ci][0] * mcux
        pp = np.empty((ph, pw), dtype=np.float64)
        ih, iw = p.shape
        pp[:ih, :iw] = p
        pp[ih:, :iw] = p[ih - 1 : ih, :]
        pp[:, iw:] = pp[:, iw - 1 : iw]
        padded.append(pp)

    wtr = _BitWriter()
    pred = [0] * nc
    mcu_count = 0
    rst = 0
    fdct_a = _IDCT_A  # FDCT(S) = A @ s @ A^T with the same basis
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                wtr.pad_to_byte()
                wtr.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * nc
            for ci in range(nc):
                t = 0 if ci == 0 else 1
                q = qnat[t]
                for by in range(sampling[ci][1]):
                    for bx in range(sampling[ci][0]):
                        y0 = (my * sampling[ci][1] + by) * 8
                        x0 = (mx * sampling[ci][0] + bx) * 8
                        blk = padded[ci][y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        coef = fdct_a @ blk @ fdct_a.T
                        qc = np.rint(coef / np.array(q).reshape(8, 8))
                        qc = qc.astype(np.int64).reshape(64)
                        diff = int(qc[0]) - pred[ci]
                        pred[ci] = int(qc[0])
                        ssss = _category(diff)
                        code, ln = enc_dc[t][ssss]
                        wtr.write(code, ln)
                        if ssss:
                            v = diff if diff >= 0 else diff + (1 << ssss) - 1
                            wtr.write(v, ssss)
                        run = 0
                        for zz in range(1, 64):
                            v = int(qc[ZIGZAG[zz]])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = enc_ac[t][0xF0]  # ZRL
                                wtr.write(code, ln)
                                run -= 16
                            s = _category(v)
                            code, ln = enc_ac[t][(run << 4) | s]
                            wtr.write(code, ln)
                            bitsv = v if v >= 0 else v + (1 << s) - 1
                            wtr.write(bitsv, s)
                            run = 0
                        if run:
                            code, ln = enc_ac[t][0x00]  # EOB
                            wtr.write(code, ln)
            mcu_count += 1
    wtr.pad_to_byte()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Synthetic corpus (the gate fixture)

#: Encoding class per doc (doc_id % 4) — every class is
#: LUMA-INVARIANT: decoded luma(y, x) = jpeg_block_gray(doc_id,
#: y // 8, x // 8) whatever the wire layout (3-component classes
#: carry flat NEUTRAL chroma, so Y is untouched; 4:2:0 only
#: subsamples those neutral planes; the restart class only
#: re-segments the entropy stream) — so ONE pixel-formula DuckDB
#: twin holds across the matrix, the PNG playbook.
JPEG_ENCODING_CLASSES = {
    0: "gray",          # 1 component
    1: "ycbcr444",      # 3 components, (1,1)x3, neutral chroma
    2: "ycbcr420",      # 3 components, Y(2,2) + chroma (1,1)
    3: "gray_rst2",     # 1 component, restart interval 2 MCUs
}


def jpeg_block_gray(doc_id: int, by: int, bx: int) -> int:
    """The EVEN gray level of block (by, bx) — even so the DC
    quantizer (16) round-trips exactly (module docstring)."""
    return 2 * ((doc_id * 7 + by * 13 + bx * 5) % 128)


def jpeg_dims(doc_id: int) -> tuple[int, int]:
    """(width, height): deliberately NOT multiples of 8/16 for most
    docs, so partial blocks and MCU padding are exercised under the
    hash gates."""
    return 8 * (doc_id % 3 + 1) + doc_id % 7, 8 * (doc_id % 2 + 1) + doc_id % 5


def synthesize_jpeg(doc_id: int) -> bytes:
    """A real, valid baseline JPEG per :data:`JPEG_ENCODING_CLASSES`
    whose decoded luma equals :func:`jpeg_block_gray` per 8x8 block
    (flat blocks at even grays — the codec fixed point)."""
    w, h = jpeg_dims(doc_id)
    cls = JPEG_ENCODING_CLASSES[doc_id % 4]
    y = np.empty((h, w), dtype=np.uint8)
    for by in range((h + 7) // 8):
        for bx in range((w + 7) // 8):
            y[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = jpeg_block_gray(
                doc_id, by, bx
            )
    if cls == "gray":
        return encode_baseline([y], w, h, [(1, 1)])
    if cls == "gray_rst2":
        return encode_baseline([y], w, h, [(1, 1)], restart_interval=2)
    if cls == "ycbcr444":
        flat = np.full((h, w), 128, dtype=np.uint8)
        return encode_baseline(
            [y, flat, flat.copy()], w, h, [(1, 1), (1, 1), (1, 1)]
        )
    # ycbcr420: chroma planes at half resolution (rounded up)
    ch, cw = (h + 1) // 2, (w + 1) // 2
    flat = np.full((ch, cw), 128, dtype=np.uint8)
    return encode_baseline(
        [y, flat, flat.copy()], w, h, [(2, 2), (1, 1), (1, 1)]
    )


def decode_jpeg_features(payload: bytes) -> dict:
    """Integer feature dict off :func:`decode_jpeg` (floats derive
    JVM-side so both engines round identically — the WAV/PNG
    convention)."""
    d = decode_jpeg(payload)
    luma = d["luma"]
    return {
        "width": d["width"],
        "height": d["height"],
        "n_components": d["n_components"],
        "n_pixels": d["width"] * d["height"],
        "pix_sum": int(luma.astype(np.int64).sum()),
    }


# ---------------------------------------------------------------------------
# Progressive (SOF2, spectral-selection-only) encoder — r12.

#: Canonical AC Huffman table for PROGRESSIVE scans. Annex-K K.5 has
#: no EOBn symbols for r > 0 (they exist only in progressive
#: streams), so the encoder ships its own flat 8-bit canonical table
#: over the full progressive AC alphabet: EOBn r=0..14, ZRL, and
#: (run, size) for run 0..15 x size 1..10 — 176 symbols, Kraft-valid
#: at one code length (176 < 256).
PROG_AC_VALS = (
    [r << 4 for r in range(15)]
    + [0xF0]
    + [(run << 4) | s for run in range(16) for s in range(1, 11)]
)
PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(PROG_AC_VALS),
                0, 0, 0, 0, 0, 0, 0, 0]


def _emit_dc_first(wtr, enc_dc, qcs, al: int) -> None:
    """DC first scan: baseline diff chain over the point-transformed
    (arithmetic ``>> al``) DC values (T.81 G.1.2.1)."""
    bh_, bw_, _ = qcs.shape
    pred = 0
    for by in range(bh_):
        for bx in range(bw_):
            dc = int(qcs[by, bx, 0]) >> al
            diff = dc - pred
            pred = dc
            ssss = _category(diff)
            code, ln = enc_dc[ssss]
            wtr.write(code, ln)
            if ssss:
                wtr.write(diff if diff >= 0 else diff + (1 << ssss) - 1,
                          ssss)


def _emit_dc_refine(wtr, qcs, al: int) -> None:
    """DC refinement: one raw magnitude bit per block — bit ``al``
    of the two's-complement DC value (G.1.2.1; floor-shift makes the
    decoder's OR reconstruction exact for negatives too)."""
    bh_, bw_, _ = qcs.shape
    for by in range(bh_):
        for bx in range(bw_):
            wtr.write((int(qcs[by, bx, 0]) >> al) & 1, 1)


def _emit_ac_first(wtr, enc_ac, qcs, ss: int, se: int, al: int) -> None:
    """AC first scan for one band: (run,size) codes + ZRL + merged
    EOBn runs over the SIGN-MAGNITUDE point transform
    (sign * (|v| >> al)) — G.1.2.2."""
    bh_, bw_, _ = qcs.shape
    eobrun = 0

    def _flush() -> None:
        nonlocal eobrun
        if not eobrun:
            return
        r = eobrun.bit_length() - 1
        code, ln = enc_ac[r << 4]
        wtr.write(code, ln)
        if r:
            wtr.write(eobrun - (1 << r), r)
        eobrun = 0

    for by in range(bh_):
        for bx in range(bw_):
            band = []
            for k in range(ss, se + 1):
                v = int(qcs[by, bx, ZIGZAG[k]])
                mag = abs(v) >> al
                band.append(mag if v >= 0 else -mag)
            nz = [i for i, v in enumerate(band) if v]
            if not nz:
                eobrun += 1
                if eobrun == 0x7FFF:  # r <= 14 cap
                    _flush()
                continue
            _flush()
            run = 0
            for i in range(nz[-1] + 1):
                v = band[i]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = enc_ac[0xF0]  # ZRL
                    wtr.write(code, ln)
                    run -= 16
                s = _category(v)
                code, ln = enc_ac[(run << 4) | s]
                wtr.write(code, ln)
                wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if nz[-1] < len(band) - 1:
                eobrun = 1  # this block's EOB opens a new run
    _flush()


def _emit_ac_refine(wtr, enc_ac, qcs, ss: int, se: int, al: int) -> None:
    """AC refinement scan (G.1.2.3, the libjpeg encode_mcu_AC_refine
    shape): newly significant coefficients ((|v| >> al) == 1) emit
    (zero-history-run, size=1) + a sign bit; every already-nonzero
    coefficient passed contributes one BUFFERED correction bit
    (emitted after the next symbol); trailing positions fold into a
    cross-block EOB run whose buffered bits flush with the EOBn
    code — the exact read order the decoder's advance loop and EOB
    tail consume."""
    bh_, bw_, _ = qcs.shape
    eobrun = 0
    pending: list[int] = []  # correction bits buffered with the EOB run

    def _flush() -> None:
        nonlocal eobrun, pending
        if eobrun > 0:
            r = eobrun.bit_length() - 1
            code, ln = enc_ac[r << 4]
            wtr.write(code, ln)
            if r:
                wtr.write(eobrun - (1 << r), r)
        for b in pending:
            wtr.write(b, 1)
        eobrun = 0
        pending = []

    for by in range(bh_):
        for bx in range(bw_):
            vals, mags = [], []
            eobpos = -1
            for i, k in enumerate(range(ss, se + 1)):
                v = int(qcs[by, bx, ZIGZAG[k]])
                m = abs(v) >> al
                vals.append(v)
                mags.append(m)
                if m == 1:
                    eobpos = i
            run = 0
            br: list[int] = []  # this block's buffered correction bits
            for i, m in enumerate(mags):
                if m == 0:
                    run += 1
                    continue
                while run > 15 and i <= eobpos:
                    _flush()
                    code, ln = enc_ac[0xF0]  # ZRL
                    wtr.write(code, ln)
                    run -= 16
                    for b in br:
                        wtr.write(b, 1)
                    br = []
                if m > 1:  # already significant: buffer its bit
                    br.append(m & 1)
                    continue
                _flush()
                code, ln = enc_ac[(run << 4) | 1]
                wtr.write(code, ln)
                wtr.write(0 if vals[i] < 0 else 1, 1)  # sign
                for b in br:
                    wtr.write(b, 1)
                br = []
                run = 0
            if run > 0 or br:
                eobrun += 1
                pending.extend(br)
                if eobrun == 0x7FFF:
                    _flush()
    _flush()


def _emit_scan_body(out, n_units: int, restart_interval: int,
                    emit_chunk) -> None:
    """Entropy-body framing shared by EVERY progressive encoder (the
    wire shape a restart fix must change in exactly ONE place —
    review finding r14: three per-encoder copies of this loop were
    the duplication hazard the 4:4:4 docstring itself warned about):
    split the scan's own unit raster into restart intervals, each
    emitted by a FRESH emitter call — DC predictors and EOB runs
    reset per interval by construction — byte-padded, separated by
    in-sequence RSTn. ``emit_chunk(wtr, start, stop)`` encodes raster
    units [start, stop)."""
    step = restart_interval if restart_interval else n_units
    rst = 0
    for start in range(0, n_units, step):
        wtr = _BitWriter()
        emit_chunk(wtr, start, min(start + step, n_units))
        wtr.pad_to_byte()
        out.extend(wtr.out)
        if start + step < n_units:
            out.extend(bytes([0xFF, 0xD0 + rst]))
            rst = (rst + 1) % 8


def _slab_from(grid: np.ndarray, positions, n_all: int) -> np.ndarray:
    """(1, n, 64) slab of the given (by, bx) raster positions of a
    (bh, bw, 64) block grid for the shared emit helpers; the full
    raster stays a zero-copy reshape (every non-chunked scan) and
    only restart chunks pay the gather."""
    if len(positions) == n_all:
        return grid.reshape(1, -1, 64)
    return np.stack(
        [grid[by, bx] for by, bx in positions]
    ).reshape(1, len(positions), 64)


def encode_progressive_gray(
    plane: np.ndarray,
    w: int,
    h: int,
    bands: tuple = ((1, 5), (6, 63)),
    dc_al: int = 0,
    ac_al: int = 0,
    restart_interval: int = 0,
) -> bytes:
    """A real progressive (SOF2) grayscale JFIF stream: one DC scan,
    then one AC scan per ``bands`` entry (contiguous, covering
    1..63) — and, when ``dc_al``/``ac_al`` are nonzero, FULL
    SUCCESSIVE APPROXIMATION: the first scans carry the point
    transform (``Al = dc_al`` / ``ac_al``) and one refinement scan
    per bit walks each band back down to Al=0 (DC refinements first,
    then per band). Quantization and FDCT are exactly
    :func:`encode_baseline`'s (Annex-K luma table, same basis), so a
    FULLY refined stream carries IDENTICAL quantized coefficients —
    decode equality vs the baseline decode of the same image is the
    roundtrip pin AND what extends the flat-block fixed point to
    this format.

    ``restart_interval`` (r13): emit DRI and split EVERY scan's
    entropy body into restart intervals of that many data units
    (blocks — the non-interleaved MCU), each interval encoded with a
    fresh DC predictor and its EOB run flushed, byte-padded, and
    separated by in-sequence RSTn markers (T.81 E.2.4) — the wire
    shape real encoders produce for web crawls."""
    if [b for pair in bands for b in pair] != sorted(
        b for pair in bands for b in pair
    ) or bands[0][0] != 1 or bands[-1][1] != 63 or any(
        bands[i][1] + 1 != bands[i + 1][0] for i in range(len(bands) - 1)
    ):
        raise ValueError("bands must tile 1..63 contiguously")
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"  # APP0
    zz = bytes(QTABLE_LUMA[ZIGZAG[i]] for i in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + zz
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    for tcth, bits, vals in (
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x10, PROG_AC_BITS, PROG_AC_VALS),
    ):
        body = bytes([tcth]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    # quantized coefficient blocks (edge-replicated padding, the
    # baseline encoder's convention)
    bw_, bh_ = (w + 7) // 8, (h + 7) // 8
    pp = np.empty((bh_ * 8, bw_ * 8), dtype=np.float64)
    pp[:h, :w] = plane[:h, :w]
    pp[h:, :w] = plane[h - 1 : h, :w]
    pp[:, w:] = pp[:, w - 1 : w]
    q = np.array(QTABLE_LUMA, dtype=np.float64).reshape(8, 8)
    qcs = np.empty((bh_, bw_, 64), dtype=np.int64)
    for by in range(bh_):
        for bx in range(bw_):
            blk = pp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = _IDCT_A @ blk @ _IDCT_A.T
            qcs[by, bx] = np.rint(coef / q).astype(np.int64).reshape(64)

    enc_dc = _enc_table(DC_LUMA_BITS, DC_LUMA_VALS)
    enc_ac = _enc_table(PROG_AC_BITS, PROG_AC_VALS)

    def _scan(ss: int, se: int, ah: int, al: int, emit) -> None:
        """Write SOS + the scan body; ``emit(wtr, blocks)`` encodes a
        (1, n, 64) block slab. Framing (interval slabs, fresh
        predictors/EOB runs, padding, in-sequence RSTn) is the shared
        :func:`_emit_scan_body`."""
        sos = bytes([1, 1, 0x00 if ss == 0 else 0x10,
                     ss, se, (ah << 4) | al])
        out.extend(b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos)
        flat = qcs.reshape(-1, 64)
        _emit_scan_body(
            out, flat.shape[0], restart_interval,
            lambda wtr, a, b: emit(wtr, flat[a:b].reshape(1, b - a, 64)),
        )

    _scan(0, 0, 0, dc_al,
          lambda wtr, qb: _emit_dc_first(wtr, enc_dc, qb, dc_al))
    for al in range(dc_al - 1, -1, -1):
        _scan(0, 0, al + 1, al,
              lambda wtr, qb, al=al: _emit_dc_refine(wtr, qb, al))
    for ss, se in bands:
        _scan(ss, se, 0, ac_al,
              lambda wtr, qb, ss=ss, se=se: _emit_ac_first(
                  wtr, enc_ac, qb, ss, se, ac_al))
        for al in range(ac_al - 1, -1, -1):
            _scan(ss, se, al + 1, al,
                  lambda wtr, qb, ss=ss, se=se, al=al: _emit_ac_refine(
                      wtr, enc_ac, qb, ss, se, al))
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def synthesize_progressive_jpeg(doc_id: int) -> bytes:
    """A real progressive (SOF2) JPEG of the SAME flat block-gray
    image as :func:`synthesize_jpeg` — decoded luma is the identical
    pixel formula, so the progressive gate reuses the baseline
    oracle. Wire-class matrix: band split alternates per doc (2-band
    vs 3-band), a third of docs layer successive approximation on
    top, and half mirror the baseline fixture's color classes:
    doc_id % 4 == 1 -> 4:4:4 progressive (interleaved DC over three
    (1,1) components), doc_id % 4 == 2 -> 4:2:0 progressive (luma
    (2,2) + half-res chroma, padded-MCU DC vs real-grid AC raster) —
    neutral chroma keeps every class luma-invariant, so only
    n_components varies in the oracle."""
    w, h = jpeg_dims(doc_id)
    y = np.empty((h, w), dtype=np.uint8)
    for by in range((h + 7) // 8):
        for bx in range((w + 7) // 8):
            y[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = jpeg_block_gray(
                doc_id, by, bx
            )
    bands = ((1, 5), (6, 63)) if doc_id % 2 == 0 else (
        (1, 1), (2, 31), (32, 63)
    )
    # a third of the corpus additionally uses SUCCESSIVE
    # APPROXIMATION (one DC and one AC magnitude bit deferred to
    # refinement scans) — fully refined streams carry the identical
    # coefficients, so the same oracle covers both wire shapes
    dc_al, ac_al = (1, 1) if doc_id % 3 == 0 else (0, 0)
    if doc_id % 4 == 1:
        # COLOR progressive (the baseline fixture's ycbcr444 class):
        # interleaved DC scan over three (1,1) components, neutral
        # chroma — luma-invariant, so only n_components changes in
        # the oracle
        return encode_progressive_ycbcr444(
            y, w, h, bands=bands, dc_al=dc_al, ac_al=ac_al,
            # restart-bearing color classes: r13 scoped DRI to the
            # INTERLEAVED DC scans (Ri=0 before the AC scans — the
            # mid-stream DRI redefinition wire shape); r14 adds the
            # full-matrix twin where the per-component AC scans ALSO
            # carry in-sequence RSTn (scope alternates per doc so the
            # gate corpus keeps both shapes)
            restart_interval=2 if doc_id % 5 == 0 else 0,
            restart_scope="all" if doc_id % 3 == 0 else "dc",
        )
    if doc_id % 4 == 2:
        # SUBSAMPLED color progressive (the baseline fixture's
        # ycbcr420 class): luma (2,2), chroma half-res — the
        # padded-MCU DC grid vs real-grid AC raster geometry, still
        # luma-invariant at the fixed point. r14: a fifth of these
        # carry DRI + RSTn in EVERY scan — subsampled interleaved DC
        # restarts count MCUs (six blocks each), the real-grid AC
        # scans count blocks, closing the restart wire matrix.
        return encode_progressive_ycbcr420(
            y, w, h, bands=bands, dc_al=dc_al, ac_al=ac_al,
            restart_interval=2 if doc_id % 5 == 0 else 0,
        )
    # restart-bearing class (r13): a fifth of the gray docs carry
    # DRI + in-sequence RSTn inside EVERY progressive scan (the wire
    # real encoders emit in web crawls) — same pixels, same oracle
    return encode_progressive_gray(
        y, w, h, bands=bands, dc_al=dc_al, ac_al=ac_al,
        restart_interval=2 if doc_id % 5 == 0 else 0,
    )


def _quantize_blocks(plane: np.ndarray, w: int, h: int, qnat) -> np.ndarray:
    """Edge-padded FDCT + quantization -> (bh, bw, 64) int64 blocks
    (the shared front half of every progressive encoder)."""
    bw_, bh_ = (w + 7) // 8, (h + 7) // 8
    pp = np.empty((bh_ * 8, bw_ * 8), dtype=np.float64)
    pp[:h, :w] = plane[:h, :w]
    pp[h:, :w] = plane[h - 1 : h, :w]
    pp[:, w:] = pp[:, w - 1 : w]
    q = np.array(qnat, dtype=np.float64).reshape(8, 8)
    qcs = np.empty((bh_, bw_, 64), dtype=np.int64)
    for by in range(bh_):
        for bx in range(bw_):
            blk = pp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            coef = _IDCT_A @ blk @ _IDCT_A.T
            qcs[by, bx] = np.rint(coef / q).astype(np.int64).reshape(64)
    return qcs


def encode_progressive_ycbcr444(
    y: np.ndarray,
    w: int,
    h: int,
    bands: tuple = ((1, 5), (6, 63)),
    dc_al: int = 0,
    ac_al: int = 0,
    restart_interval: int = 0,
    restart_scope: str = "dc",
) -> bytes:
    """A real COLOR progressive (SOF2) stream: YCbCr at (1,1)x3
    sampling with flat NEUTRAL chroma (128 — luma-invariant, the
    wire-class convention of :func:`synthesize_jpeg`). Scan script:
    one INTERLEAVED DC first scan over all three components (each
    MCU carries one block per component), interleaved DC
    refinements, then per-component AC band scans (+ refinements) —
    AC scans are single-component by spec (T.81 G.1.1.1.1). Tables:
    Annex-K luma/chroma quant, K.3 DC tables, the shared progressive
    AC alphabet table.

    ``restart_scope`` (r14, VERDICT r13 ask #7): ``"dc"`` keeps the
    r13 wire shape — DRI scoped to the interleaved DC scans and
    redefined to Ri=0 before the AC scans (the mid-stream DRI
    redefinition class); ``"all"`` leaves DRI in force so every
    per-component AC band/refinement scan ALSO splits into restart
    intervals of ``restart_interval`` data units (blocks) with
    in-sequence RSTn and fresh EOB runs — the full-matrix wire
    shape."""
    if [b for pair in bands for b in pair] != sorted(
        b for pair in bands for b in pair
    ) or bands[0][0] != 1 or bands[-1][1] != 63 or any(
        bands[i][1] + 1 != bands[i + 1][0] for i in range(len(bands) - 1)
    ):
        raise ValueError("bands must tile 1..63 contiguously")
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"  # APP0
    for tq, nat in ((0, QTABLE_LUMA), (1, QTABLE_CHROMA)):
        zz = bytes(nat[ZIGZAG[i]] for i in range(64))
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    for tcth, bits, vals in (
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (0x10, PROG_AC_BITS, PROG_AC_VALS),
    ):
        body = bytes([tcth]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    flat = np.full((h, w), 128, dtype=np.uint8)
    qcs_list = [
        _quantize_blocks(y, w, h, QTABLE_LUMA),
        _quantize_blocks(flat, w, h, QTABLE_CHROMA),
        _quantize_blocks(flat, w, h, QTABLE_CHROMA),
    ]
    enc_dcs = [
        _enc_table(DC_LUMA_BITS, DC_LUMA_VALS),
        _enc_table(DC_CHROMA_BITS, DC_CHROMA_VALS),
        _enc_table(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    enc_ac = _enc_table(PROG_AC_BITS, PROG_AC_VALS)
    bh_, bw_, _ = qcs_list[0].shape

    #: MCU raster for the interleaved DC scans ((1,1) sampling: one
    #: block position per MCU); restart chunking slices this list.
    mcus = [(by, bx) for by in range(bh_) for bx in range(bw_)]

    def _scan(comp_specs, ss, se, ah, al, emit_range,
              chunked=False) -> None:
        """Write SOS + the scan body; ``emit_range(wtr, rng)``
        encodes the given MCU positions. ``chunked`` (when
        ``restart_interval`` is set) splits the MCU raster into
        restart intervals via the shared :func:`_emit_scan_body`
        framing — per-component predictors start at 0 per interval,
        matching the decoder's reset."""
        sos = bytes([len(comp_specs)])
        for cid, tt in comp_specs:
            sos += bytes([cid, tt])
        sos += bytes([ss, se, (ah << 4) | al])
        out.extend(b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos)
        _emit_scan_body(
            out, len(mcus),
            restart_interval if chunked else 0,
            lambda wtr, a, b: emit_range(wtr, mcus[a:b]),
        )

    def _dc_first_range(wtr, rng) -> None:
        preds = [0, 0, 0]
        for by, bx in rng:
            for ci in range(3):
                dc = int(qcs_list[ci][by, bx, 0]) >> dc_al
                diff = dc - preds[ci]
                preds[ci] = dc
                ssss = _category(diff)
                code, ln = enc_dcs[ci][ssss]
                wtr.write(code, ln)
                if ssss:
                    wtr.write(
                        diff if diff >= 0
                        else diff + (1 << ssss) - 1,
                        ssss,
                    )

    def _dc_refine_range(wtr, rng, al) -> None:
        for by, bx in rng:
            for ci in range(3):
                wtr.write(
                    (int(qcs_list[ci][by, bx, 0]) >> al) & 1, 1
                )

    def _slab(ci: int, rng) -> np.ndarray:
        """Component ``ci``'s raster positions as an emit slab — at
        (1,1)x3 the per-component block raster IS the MCU raster, so
        restart chunking slices the same position list for every
        scan kind."""
        return _slab_from(qcs_list[ci], rng, len(mcus))

    if restart_scope not in ("dc", "all"):
        raise ValueError(f"unknown restart_scope {restart_scope!r}")
    ac_chunked = bool(restart_interval) and restart_scope == "all"
    dc_specs = [(1, 0x00), (2, 0x10), (3, 0x10)]
    if restart_interval:
        out.extend(b"\xff\xdd" + struct.pack(">HH", 4, restart_interval))
    _scan(dc_specs, 0, 0, 0, dc_al, _dc_first_range, chunked=True)
    for al in range(dc_al - 1, -1, -1):
        _scan(dc_specs, 0, 0, al + 1, al,
              lambda wtr, rng, al=al: _dc_refine_range(wtr, rng, al),
              chunked=True)
    if restart_interval and restart_scope == "dc":
        # the r13 wire class: DRI applies to every following scan
        # until redefined, so switch it OFF (Ri = 0, legal per T.81)
        # before the AC scans, which stay restart-free
        out.extend(b"\xff\xdd" + struct.pack(">HH", 4, 0))
    for ci, cid in enumerate((1, 2, 3)):
        for ss, se in bands:
            _scan([(cid, 0x10)], ss, se, 0, ac_al,
                  lambda wtr, rng, ci=ci, ss=ss, se=se: _emit_ac_first(
                      wtr, enc_ac, _slab(ci, rng), ss, se, ac_al),
                  chunked=ac_chunked)
            for al in range(ac_al - 1, -1, -1):
                _scan([(cid, 0x10)], ss, se, al + 1, al,
                      lambda wtr, rng, ci=ci, ss=ss, se=se, al=al:
                      _emit_ac_refine(
                          wtr, enc_ac, _slab(ci, rng), ss, se, al),
                      chunked=ac_chunked)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_progressive_ycbcr420(
    y: np.ndarray,
    w: int,
    h: int,
    bands: tuple = ((1, 5), (6, 63)),
    dc_al: int = 0,
    ac_al: int = 0,
    restart_interval: int = 0,
) -> bytes:
    """A real SUBSAMPLED color progressive (SOF2) stream: luma at
    (2,2), chroma at (1,1) half resolution (neutral 128 — luma-
    invariant). The geometry this pins beyond the 4:4:4 form: the
    interleaved DC scan rasters MCUs carrying FOUR luma blocks + one
    block per chroma (padding blocks included), while each
    non-interleaved AC scan rasters only its component's REAL block
    grid (ceil of the scaled dims, T.81 A.2.4) — the padded-vs-real
    split that makes subsampled progressive genuinely different.

    ``restart_interval`` (r14, VERDICT r13 ask #7): DRI + in-sequence
    RSTn in EVERY scan — the interleaved DC scans restart every
    ``restart_interval`` MCUs (all six blocks of an MCU inside one
    interval; per-component predictors reset per interval), the
    non-interleaved AC scans every ``restart_interval`` BLOCKS of
    their component's real grid (T.81 E.2.4: the restart interval is
    counted in the scan's own MCU unit). This closes the last cell of
    the restart wire matrix: subsampled interleaved DC and
    per-component AC."""
    if [b for pair in bands for b in pair] != sorted(
        b for pair in bands for b in pair
    ) or bands[0][0] != 1 or bands[-1][1] != 63 or any(
        bands[i][1] + 1 != bands[i + 1][0] for i in range(len(bands) - 1)
    ):
        raise ValueError("bands must tile 1..63 contiguously")
    cw, ch2 = (w + 1) // 2, (h + 1) // 2  # chroma real dims
    mcux, mcuy = (w + 15) // 16, (h + 15) // 16
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"  # APP0
    for tq, nat in ((0, QTABLE_LUMA), (1, QTABLE_CHROMA)):
        zz = bytes(nat[ZIGZAG[i]] for i in range(64))
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + zz
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for cid, hv, tq in ((1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1)):
        sof += bytes([cid, hv, tq])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    for tcth, bits, vals in (
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (0x10, PROG_AC_BITS, PROG_AC_VALS),
    ):
        body = bytes([tcth]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    flat = np.full((ch2, cw), 128, dtype=np.uint8)
    # padded quantized grids: luma to the 16-px MCU grid, chroma to
    # the 8-px grid implied by the same MCU count
    qy = _quantize_blocks(y, w, h, QTABLE_LUMA)  # real luma grid
    # re-pad luma blocks to the MCU grid (2*mcux x 2*mcuy blocks) by
    # quantizing the MCU-padded plane — edge replication must extend
    # to the FULL padded area so padding blocks carry valid DC
    ly = np.empty((16 * mcuy, 16 * mcux), dtype=np.float64)
    ly[:h, :w] = y[:h, :w]
    ly[h:, :w] = y[h - 1 : h, :w]
    ly[:, w:] = ly[:, w - 1 : w]
    qy = _quantize_blocks(
        ly.astype(np.uint8), 16 * mcux, 16 * mcuy, QTABLE_LUMA
    )
    qc = _quantize_blocks(
        np.full((8 * mcuy, 8 * mcux), 128, dtype=np.uint8),
        8 * mcux, 8 * mcuy, QTABLE_CHROMA,
    )
    qcs_list = [qy, qc, qc]
    samplings = [(2, 2), (1, 1), (1, 1)]
    real_grids = [
        ((h + 7) // 8, (w + 7) // 8),
        ((ch2 + 7) // 8, (cw + 7) // 8),
        ((ch2 + 7) // 8, (cw + 7) // 8),
    ]
    enc_dcs = [
        _enc_table(DC_LUMA_BITS, DC_LUMA_VALS),
        _enc_table(DC_CHROMA_BITS, DC_CHROMA_VALS),
        _enc_table(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ]
    enc_ac = _enc_table(PROG_AC_BITS, PROG_AC_VALS)

    def _scan(comp_specs, ss, se, ah, al, emit_range, units) -> None:
        """Write SOS + the scan body; ``emit_range(wtr, rng)``
        encodes the given slice of ``units`` (the scan's own MCU
        raster: (my, mx) MCUs for the interleaved DC scans, (by, bx)
        real-grid blocks for the non-interleaved AC scans). Framing
        is the shared :func:`_emit_scan_body`."""
        sos = bytes([len(comp_specs)])
        for cid, tt in comp_specs:
            sos += bytes([cid, tt])
        sos += bytes([ss, se, (ah << 4) | al])
        out.extend(b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos)
        _emit_scan_body(
            out, len(units), restart_interval,
            lambda wtr, a, b: emit_range(wtr, units[a:b]),
        )

    mcus = [(my, mx) for my in range(mcuy) for mx in range(mcux)]

    def _dc_first(wtr, rng) -> None:
        preds = [0, 0, 0]
        for my, mx in rng:
            for ci in range(3):
                hi, vi = samplings[ci]
                for byi in range(vi):
                    for bxi in range(hi):
                        dc = int(
                            qcs_list[ci][
                                my * vi + byi, mx * hi + bxi, 0
                            ]
                        ) >> dc_al
                        diff = dc - preds[ci]
                        preds[ci] = dc
                        ssss = _category(diff)
                        code, ln = enc_dcs[ci][ssss]
                        wtr.write(code, ln)
                        if ssss:
                            wtr.write(
                                diff if diff >= 0
                                else diff + (1 << ssss) - 1,
                                ssss,
                            )

    def _dc_refine(wtr, rng, al) -> None:
        for my, mx in rng:
            for ci in range(3):
                hi, vi = samplings[ci]
                for byi in range(vi):
                    for bxi in range(hi):
                        wtr.write(
                            (int(qcs_list[ci][
                                my * vi + byi, mx * hi + bxi, 0
                            ]) >> al) & 1,
                            1,
                        )

    if restart_interval:
        out.extend(b"\xff\xdd" + struct.pack(">HH", 4, restart_interval))
    dc_specs = [(1, 0x00), (2, 0x10), (3, 0x10)]
    _scan(dc_specs, 0, 0, 0, dc_al, _dc_first, mcus)
    for al in range(dc_al - 1, -1, -1):
        _scan(dc_specs, 0, 0, al + 1, al,
              lambda wtr, rng, al=al: _dc_refine(wtr, rng, al), mcus)
    for ci, cid in enumerate((1, 2, 3)):
        # non-interleaved AC scans raster the REAL grid only: slice
        # the padded array down so the shared emit helpers see
        # exactly the blocks the decoder will visit
        rbh, rbw = real_grids[ci]
        real = qcs_list[ci][:rbh, :rbw]
        runits = [(by, bx) for by in range(rbh) for bx in range(rbw)]

        def _rslab(rng, real=real, n_all=rbh * rbw) -> np.ndarray:
            return _slab_from(real, rng, n_all)

        for ss, se in bands:
            _scan([(cid, 0x10)], ss, se, 0, ac_al,
                  lambda wtr, rng, _rslab=_rslab, ss=ss, se=se:
                  _emit_ac_first(
                      wtr, enc_ac, _rslab(rng), ss, se, ac_al),
                  runits)
            for al in range(ac_al - 1, -1, -1):
                _scan([(cid, 0x10)], ss, se, al + 1, al,
                      lambda wtr, rng, _rslab=_rslab, ss=ss, se=se, al=al:
                      _emit_ac_refine(
                          wtr, enc_ac, _rslab(rng), ss, se, al),
                      runits)
    out += b"\xff\xd9"  # EOI
    return bytes(out)
