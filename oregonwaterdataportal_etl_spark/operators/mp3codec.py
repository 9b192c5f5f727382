"""MPEG audio (MP3) frame-header parser — REAL metadata, no decode.

Walks the physical frame sequence of an MPEG-1/2/2.5 Layer I-III
stream (skipping a leading ID3v2 tag) and derives duration, bitrate,
sample rate, channel mode and frame count from the 4-byte frame
headers alone. Full PCM decode (hybrid filterbank + Huffman) is out of
scope for an in-tree codec — `multimodal._decode_one` keeps the
flagged decoded=false stub for audio/mpeg FEATURES, while
`probe_media` serves honest typed metadata from this parser.

Format reference: public ISO/IEC 11172-3 header layout (the bitrate /
sample-rate index tables are published constants).
"""

from __future__ import annotations

import struct

ID3_MAGIC = b"ID3"

# kbit/s, indexed [version_group][layer][bitrate_index]; version_group
# 0 = MPEG-1, 1 = MPEG-2/2.5. Index 0 ("free") and 15 are invalid here.
_BITRATES = {
    (0, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (0, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (0, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (1, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (1, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (1, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_RATES = {0: [44100, 48000, 32000], 2: [22050, 24000, 16000], 3: [11025, 12000, 8000]}
_CHANNELS = ["stereo", "joint_stereo", "dual_channel", "mono"]


def _frame_at(data: bytes, pos: int) -> tuple[int, int, int, int, str] | None:
    """Parse a frame header at pos -> (frame_len, samples, bitrate_bps,
    sample_rate, channel_mode), or None if not a valid header."""
    if pos + 4 > len(data):
        return None
    (hdr,) = struct.unpack_from(">I", data, pos)
    if (hdr >> 21) & 0x7FF != 0x7FF:
        return None
    version_bits = (hdr >> 19) & 3  # 0=2.5, 2=2, 3=1 (1 reserved)
    layer_bits = (hdr >> 17) & 3  # 3=I, 2=II, 1=III (0 reserved)
    if version_bits == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits
    vgroup = 0 if version_bits == 3 else 1
    br_idx = (hdr >> 12) & 0xF
    sr_idx = (hdr >> 10) & 3
    if br_idx in (0, 15) or sr_idx == 3:
        return None
    rate_row = {3: 0, 2: 2, 0: 3}[version_bits]
    sample_rate = _RATES[rate_row][sr_idx]
    bitrate = _BITRATES[(vgroup, layer)][br_idx] * 1000
    padding = (hdr >> 9) & 1
    if layer == 1:
        samples = 384
        frame_len = (12 * bitrate // sample_rate + padding) * 4
    else:
        samples = 1152 if (layer == 2 or vgroup == 0) else 576
        coef = 144 if (layer == 2 or vgroup == 0) else 72
        frame_len = coef * bitrate // sample_rate + padding
    if frame_len < 4:
        return None
    return frame_len, samples, bitrate, sample_rate, _CHANNELS[(hdr >> 6) & 3]


def parse_mp3_info(payload: bytes) -> dict:
    """Walk all frames -> {n_frames, duration_s, sample_rate,
    bit_rate (length-weighted mean, exact for CBR), channel_mode}.
    Raises ValueError when no coherent frame sequence exists."""
    pos = 0
    if payload.startswith(ID3_MAGIC) and len(payload) >= 10:
        # syncsafe 28-bit size after the 10-byte ID3v2 header
        size = (
            (payload[6] & 0x7F) << 21
            | (payload[7] & 0x7F) << 14
            | (payload[8] & 0x7F) << 7
            | (payload[9] & 0x7F)
        )
        pos = 10 + size
    # tolerate a little junk before the first sync, as real decoders do
    first = None
    for scan in range(pos, min(pos + 4096, len(payload) - 3)):
        if _frame_at(payload, scan):
            first = scan
            break
    if first is None:
        raise ValueError("no MPEG audio frame sync found")
    pos, n_frames, total_samples, byte_sum = first, 0, 0, 0
    sample_rate = None
    mode = None
    while pos + 4 <= len(payload):
        fr = _frame_at(payload, pos)
        if fr is None:
            break  # trailing tag (ID3v1/APE) or truncation
        frame_len, samples, bitrate, rate, ch = fr
        if sample_rate is None:
            sample_rate, mode = rate, ch
        elif rate != sample_rate:
            break  # a sample-rate change mid-stream is not one stream
        n_frames += 1
        total_samples += samples
        byte_sum += frame_len
        pos += frame_len
    if n_frames == 0:
        raise ValueError("no MPEG audio frames parsed")
    duration = total_samples / sample_rate
    return {
        "n_frames": n_frames,
        "duration_s": round(duration, 6),
        "sample_rate": sample_rate,
        "bit_rate": int(round(byte_sum * 8 / duration)) if duration else None,
        "channel_mode": mode,
    }


def encode_mp3_cbr_stub(
    n_frames: int = 10, bitrate_kbps: int = 128, sample_rate: int = 44100
) -> bytes:
    """Build a syntactically valid CBR MPEG-1 Layer III frame sequence
    (headers + zeroed side-info/main data). NOT playable audio — it
    exists so tests can exercise parse_mp3_info against a stream with
    known ground truth without shipping binary fixtures."""
    br_idx = _BITRATES[(0, 3)].index(bitrate_kbps)
    sr_idx = _RATES[0].index(sample_rate)
    hdr = (
        0x7FF << 21 | 3 << 19 | 1 << 17 | 1 << 16  # sync, MPEG-1, L3, no CRC
        | br_idx << 12 | sr_idx << 10 | 3 << 6  # bitrate, rate, mono
    )
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate
    frame = struct.pack(">I", hdr) + bytes(frame_len - 4)
    return frame * n_frames
