"""Deterministic IMA/DVI ADPCM WAV encoder twin — the test-side
counterpart of ``operators.multimodal.decode_ima_adpcm`` (the
``tests/flac_fixture.py`` pattern): the encoder runs the DECODER's own
state-update routine (``_ima_step``) after quantizing each delta, so
encoder and decoder reconstruction are in exact lockstep, and the
vendored fixture (tests/fixtures/tiny_ima.wav) byte-pins the encoding
against drift in either twin.

Public-spec codec: IMA Digital Audio TWG recommendation; WAV mapping
wFormatTag 0x11 (4-byte per-channel block headers, 4-byte per-channel
word interleave, low nibble first).
"""

from __future__ import annotations

import struct

import numpy as np

from sensomics_data_pipeline_spark.operators.multimodal import (
    _IMA_STEP_TABLE,
    _ima_step,
)


def _encode_step(pred: int, index: int, sample: int):
    """Quantize one delta to a 4-bit code, then advance (pred, index)
    with the decoder's update — returns (nibble, pred, index)."""
    step = _IMA_STEP_TABLE[index]
    delta = int(sample) - pred
    nib = 0
    if delta < 0:
        nib = 8
        delta = -delta
    if delta >= step:
        nib |= 4
        delta -= step
    if delta >= step >> 1:
        nib |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        nib |= 1
    pred, index = _ima_step(pred, index, nib)
    return nib, pred, index


def encode_ima_adpcm_wav(
    samples: "np.ndarray", sample_rate: int = 8000, block_align: int = 36
):
    """Encode int16 samples (shape ``(frames, channels)``) into a
    complete IMA-ADPCM WAV payload. Returns ``(payload,
    reconstruction)`` where reconstruction is the decoder-lockstep
    int16 signal (what ``decode_ima_adpcm`` must reproduce EXACTLY).

    ``frames`` must be an exact multiple of the block's
    ``samples_per_block = 1 + (block_align − 4·ch)·2/ch`` — fixtures
    are sized to fit rather than padded."""
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    frames, ch = samples.shape
    data_bytes = block_align - 4 * ch
    if data_bytes <= 0 or data_bytes % (4 * ch):
        raise ValueError("block_align does not fit 4-byte word interleave")
    spb = 1 + data_bytes * 2 // ch
    if frames % spb:
        raise ValueError(f"frames {frames} not a multiple of {spb}")

    out = bytearray()
    recon = np.empty_like(samples)
    idxs = [0] * ch  # step index carries across blocks (per channel)
    for b0 in range(0, frames, spb):
        block = samples[b0 : b0 + spb]
        preds = []
        for c in range(ch):
            pred = int(block[0, c])
            out += struct.pack("<hBB", pred, idxs[c], 0)
            preds.append(pred)
            recon[b0, c] = pred
        pos = 1
        while pos < spb:
            for c in range(ch):
                word = 0
                for j in range(8):
                    nib, preds[c], idxs[c] = _encode_step(
                        preds[c], idxs[c], int(block[pos + j, c])
                    )
                    recon[b0 + pos + j, c] = preds[c]
                    word |= nib << (4 * j)
                out += struct.pack("<I", word)
            pos += 8

    byte_rate = sample_rate * block_align * ch // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, ch, sample_rate, byte_rate, block_align, 4, 2, spb
    )
    payload = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(out))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(out))
        + bytes(out)
    )
    return payload, recon
