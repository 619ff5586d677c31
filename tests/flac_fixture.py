"""Spec-compliant FLAC-subset ENCODER — test-fixture generator for the
pure-Python decoder (`operators.multimodal.decode_flac_subset`).

Implements the public xiph.org FLAC format directly (STREAMINFO +
fixed-blocking frames, independent channels, CONSTANT / VERBATIM /
FIXED / LPC subframes with Rice-coded residuals and wasted bits,
CRC-8 header + CRC-16 frame checksums) so the decoder is tested
against an INDEPENDENT writing of the spec, not against its own
mirror image: every field is assembled here from the spec text, and
byte-for-byte vendored fixtures (tests/fixtures/tiny.flac,
tests/fixtures/tiny_lpc.flac) pin the encoding against drift in
either direction.
"""

from __future__ import annotations

from sensomics_data_pipeline_spark.operators.multimodal import (
    _flac_crc8,
    _flac_crc16,
)


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def align(self) -> None:
        while len(self.bits) % 8:
            self.bits.append(0)

    def to_bytes(self) -> bytes:
        assert len(self.bits) % 8 == 0
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v) << 1) - 1


def _write_rice_residual(w: "_BitWriter", residuals) -> None:
    """Method-0 (4-bit parameter) Rice coding, one partition, best
    parameter by exact bit count."""
    best = min(range(15), key=lambda p: sum(
        (_zigzag(v) >> p) + 1 + p for v in residuals
    ))
    w.write(0, 2)  # residual method: 4-bit Rice
    w.write(0, 4)  # partition order 0
    w.write(best, 4)
    for v in residuals:
        u = _zigzag(v)
        for _ in range(u >> best):
            w.write(0, 1)
        w.write(1, 1)
        w.write(u & ((1 << best) - 1), best)


def _write_subframe(
    w: "_BitWriter", block, bps: int, predictor, wasted: int
) -> None:
    w.write(0, 1)  # subframe header padding bit
    vals = block
    if wasted:
        assert all(v % (1 << wasted) == 0 for v in block), (
            "wasted-bits encoding needs all samples divisible by "
            f"2^{wasted}"
        )
        vals = [v >> wasted for v in block]
    sbps = bps - wasted

    def _wasted_flag() -> None:
        if wasted:
            w.write(1, 1)  # flag
            for _ in range(wasted - 1):  # unary (wasted - 1)
                w.write(0, 1)
            w.write(1, 1)
        else:
            w.write(0, 1)

    if predictor is not None and len(vals) <= (
        predictor[1] if predictor[0] == "fixed" else len(predictor[1])
    ):
        predictor = None  # short final frame: order wouldn't fit
    if predictor is None:
        if len(set(vals)) == 1:
            w.write(0b000000, 6)  # CONSTANT
            _wasted_flag()
            w.write_signed(vals[0], sbps)
        else:
            w.write(0b000001, 6)  # VERBATIM
            _wasted_flag()
            for s in vals:
                w.write_signed(s, sbps)
    elif predictor[0] == "fixed":
        order = predictor[1]
        coefs = _FIXED_COEFS[order]
        w.write(0b001000 | order, 6)
        _wasted_flag()
        for s in vals[:order]:
            w.write_signed(s, sbps)
        residuals = [
            vals[i] - sum(c * vals[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, len(vals))
        ]
        _write_rice_residual(w, residuals)
    else:  # ("lpc", coefs, shift, precision)
        _, coefs, shift, prec = predictor
        order = len(coefs)
        w.write(0b100000 | (order - 1), 6)
        _wasted_flag()
        for s in vals[:order]:
            w.write_signed(s, sbps)
        w.write(prec - 1, 4)
        w.write_signed(shift, 5)
        for c in coefs:
            w.write_signed(c, prec)
        residuals = [
            vals[i]
            - (sum(c * vals[i - 1 - j] for j, c in enumerate(coefs)) >> shift)
            for i in range(order, len(vals))
        ]
        _write_rice_residual(w, residuals)


def encode_flac_subset(
    samples,  # list[list[int]] — samples[channel][frame_idx], int
    sample_rate: int = 8000,
    bps: int = 16,
    blocksize: int = 16,
    predictor=None,  # None | ("fixed", order) | ("lpc", coefs, shift, prec)
    wasted: int = 0,
) -> bytes:
    """Encode integer channel data as a FLAC stream using fixed
    blocking, an 8-bit end-of-header blocksize field (code 0b0110),
    and per-frame subframe selection: with ``predictor=None``,
    CONSTANT when a channel's block is a single repeated value,
    VERBATIM otherwise; ``("fixed", order)`` / ``("lpc", coefs,
    shift, precision)`` emit predicted subframes with Rice-coded
    residuals (lossless by construction — the residual recurrence is
    the exact inverse of the decoder's). ``wasted`` emits samples
    right-shifted by that many (all-zero) low bits, spec wasted-bits
    encoding."""
    n_channels = len(samples)
    total = len(samples[0])
    assert all(len(c) == total for c in samples)
    assert blocksize <= 256  # 8-bit (blocksize-1) field

    # ---- STREAMINFO (34 bytes), marked last metadata block ----
    si = _BitWriter()
    si.write(blocksize, 16)  # min blocksize
    si.write(blocksize, 16)  # max blocksize
    si.write(0, 24)  # min framesize (0 = unknown)
    si.write(0, 24)  # max framesize
    si.write(sample_rate, 20)
    si.write(n_channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    si.write(0, 128)  # MD5 unknown
    body = si.to_bytes()
    out = bytearray(b"fLaC")
    out.append(0x80 | 0x00)  # last-block flag, type 0 = STREAMINFO
    out += len(body).to_bytes(3, "big")
    out += body

    # sample-rate header code (subset: table rates only — trailing-field
    # codes 12-14 are exercised decoder-side via the table fallback)
    rate_codes = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
                  22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10,
                  96000: 11}
    sr_code = rate_codes[sample_rate]
    ss_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bps]

    for frame_no, start in enumerate(range(0, total, blocksize)):
        bs = min(blocksize, total - start)
        w = _BitWriter()
        w.write(0b11111111111110, 14)  # sync
        w.write(0, 1)  # reserved
        w.write(0, 1)  # fixed blocking
        w.write(0b0110, 4)  # blocksize: 8-bit field at end of header
        w.write(sr_code, 4)
        w.write(n_channels - 1, 4)  # independent channels
        w.write(ss_code, 3)
        w.write(0, 1)  # reserved
        assert frame_no < 0x80  # single-byte UTF-8 frame number
        w.write(frame_no, 8)
        w.write(bs - 1, 8)
        hdr = w.to_bytes()
        hdr += bytes([_flac_crc8(hdr)])

        w = _BitWriter()
        for ch in samples:
            _write_subframe(w, ch[start : start + bs], bps, predictor, wasted)
        w.align()
        frame = hdr + w.to_bytes()
        frame += _flac_crc16(frame).to_bytes(2, "big")
        out += frame

    return bytes(out)
