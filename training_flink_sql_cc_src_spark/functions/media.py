"""Real media-container header codecs — pure stdlib, no media libraries.

The reference's pipeline treats media as opaque bytes + typed metadata
(SURVEY.md §2.9 multimodal columns). PIXEL decode needs PIL/ffmpeg (absent
in this container and stubbed in queries/multimodal._decode_payload), but
CONTAINER METADATA does not: PNG IHDR, JPEG SOF and WAV fmt headers are
fixed binary layouts parseable with struct — the same code parses real
files byte-for-byte. Builders emit spec-valid minimal files (PNG chunk
CRCs via zlib.crc32, RIFF sizes correct), so the parse step is a genuine
decode, not a fake: multimodal_header_decode round-trips
build → binary column → Arrow batch → parse and the DuckDB oracle checks
the recovered metadata end-to-end.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ------------------------------------------------------------------ builders
def png_bytes(width: int, height: int, bit_depth: int = 8, color_type: int = 2) -> bytes:
    """Minimal spec-valid PNG: signature + IHDR (with CRC) + IEND."""

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0)
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")


def jpeg_bytes(width: int, height: int, components: int = 3) -> bytes:
    """Minimal JPEG: SOI + JFIF APP0 + SOF0 frame header + EOI."""
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    comps = b"".join(struct.pack("BBB", i + 1, 0x11, 0) for i in range(components))
    sof_body = struct.pack(">BHHB", 8, height, width, components) + comps
    return (
        b"\xff\xd8"  # SOI
        + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
        + b"\xff\xc0" + struct.pack(">H", len(sof_body) + 2) + sof_body
        + b"\xff\xd9"  # EOI
    )


def wav_bytes(sample_rate: int, channels: int, bits: int, n_samples: int = 0) -> bytes:
    """Minimal spec-valid WAV: RIFF + fmt(PCM) + empty-ish data chunk."""
    block_align = channels * bits // 8
    data = bytes(n_samples * block_align)
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ------------------------------------------------------------------- parser
def parse_media_header(payload: bytes | None) -> dict:
    """Detect container and parse its real header. Returns a dict with
    container ∈ {png, jpeg, wav, unknown} and the typed metadata the
    format carries (absent dimensions are None)."""
    out = {
        "container": "unknown",
        "width": None,
        "height": None,
        "channels": None,
        "sample_rate": None,
        "bit_depth": None,
    }
    if not payload or len(payload) < 12:
        return out
    if payload[:8] == _PNG_SIG:
        # IHDR must be the first chunk: length(4) tag(4) body(13) crc(4)
        if payload[12:16] == b"IHDR" and len(payload) >= 33:
            w, h, depth, _ctype = struct.unpack(">IIBB", payload[16:26])
            tag_body = payload[12:29]
            (crc,) = struct.unpack(">I", payload[29:33])
            if crc == (zlib.crc32(tag_body) & 0xFFFFFFFF):
                out.update(
                    container="png", width=w, height=h, bit_depth=depth
                )
        return out
    if payload[:2] == b"\xff\xd8":
        out["container"] = "jpeg"
        i = 2
        while i + 4 <= len(payload):
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            if marker == 0xD9:  # EOI
                break
            (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
            if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                depth, h, w, ncomp = struct.unpack(
                    ">BHHB", payload[i + 4 : i + 10]
                )
                out.update(
                    width=w, height=h, channels=ncomp, bit_depth=depth
                )
                break
            i += 2 + seg_len
        return out
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        out["container"] = "wav"
        i = 12
        while i + 8 <= len(payload):
            tag = payload[i : i + 4]
            (chunk_len,) = struct.unpack("<I", payload[i + 4 : i + 8])
            if tag == b"fmt " and i + 8 + 16 <= len(payload):
                _fmt, ch, sr, _bps, _ba, bits = struct.unpack(
                    "<HHIIHH", payload[i + 8 : i + 24]
                )
                out.update(channels=ch, sample_rate=sr, bit_depth=bits)
                break
            i += 8 + chunk_len + (chunk_len & 1)
        return out
    return out
