"""Minimal in-tree GIF codec (pure stdlib + numpy): GIF87a/GIF89a.

Full LZW decode/encode (variable code width, clear/EOI, 12-bit cap
with mid-stream dictionary resets), interlaced images, local color
tables, transparency, and animated GIFs with disposal methods 0-3
(composited to full RGB frames exactly like a viewer would). The
encoder writes exact-palette GIFs when the frame set has <=256
distinct colors and falls back to a deterministic uniform 6x7x6
quantization otherwise, so `decode(encode(x)) == x` bit-for-bit
whenever x is palette-sized — the invariant the tests pin.

Scope (same honesty contract as the other in-tree codecs): plain-text
extensions are skipped, sort flags ignored (they are advisory), and
malformed streams raise ValueError so the multimodal layer falls back
to its flagged decoded=false stub.

Reference parity note: the reference ETL treats media attachments as
opaque binary payloads with typed metadata (SURVEY.md §2.1 S8); real
decode is the training-data-pipeline extension this engine adds.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGIC = b"GIF8"  # GIF87a / GIF89a


# ---------------------------------------------------------------- LZW


def lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """Decode a GIF LZW stream (sub-blocks already concatenated)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()

    # bit reader, LSB-first
    bitpos = 0
    nbits = len(data) * 8

    def read_code(width: int) -> int | None:
        nonlocal bitpos
        if bitpos + width > nbits:
            return None
        byte0 = bitpos >> 3
        v = int.from_bytes(data[byte0 : byte0 + 3], "little")
        v = (v >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        return v

    def reset_table() -> tuple[list[bytes], int]:
        return [bytes([i]) for i in range(clear)] + [b"", b""], min_code_size + 1

    table, width = reset_table()
    prev: bytes | None = None
    while True:
        code = read_code(width)
        if code is None:
            break  # truncated stream: emit what we have (viewers do)
        if code == clear:
            table, width = reset_table()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"LZW code {code} out of range (table {len(table)})")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        if len(table) >= (1 << width) and width < 12:
            width += 1
        prev = entry
    return bytes(out)


def lzw_encode(pixels: bytes, min_code_size: int) -> bytes:
    """Encode pixel indices as a GIF LZW stream (no sub-blocking)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    accbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += width
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix = b""
    for b in pixels:
        cand = prefix + bytes([b])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], width)
        if next_code < 4096:
            table[cand] = next_code
            # the decoder assigns this code one step later (deferred
            # append), so widen when the ASSIGNED code hits 2^width —
            # that lines the width switch up with the decoder's
            # len(table) >= 1<<width check on its next read
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([b])
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    """Wrap a byte stream into <=255-byte GIF sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


# ------------------------------------------------------------- decode


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    out = np.empty_like(rows)
    out[np.asarray(order)] = rows
    return out


def _parse_blocks(payload: bytes):
    """Yield (kind, dict) events: ('gce', ...), ('image', ...).

    Shared by the frame compositor and gif_info so the container walk
    exists exactly once.
    """
    if payload[:4] != GIF_MAGIC or payload[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF87a/GIF89a payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, packed, bg_index, _aspect = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        if gct.shape[0] != n:
            raise ValueError("truncated global color table")
        pos += 3 * n
    yield "screen", {"width": sw, "height": sh, "gct": gct, "bg_index": bg_index}

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(payload):
                raise ValueError("unterminated sub-blocks")
            n = payload[p]
            p += 1 + n
            if n == 0:
                return p

    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            return
        if b == 0x21:  # extension
            if pos >= len(payload):
                raise ValueError("truncated extension")
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                blen = payload[pos]
                body = payload[pos + 1 : pos + 1 + blen]
                if blen >= 4:
                    gpacked = body[0]
                    delay_cs = struct.unpack("<H", body[1:3])[0]
                    yield "gce", {
                        "disposal": (gpacked >> 2) & 0x7,
                        "transparent": body[3] if gpacked & 1 else None,
                        "delay_cs": delay_cs,
                    }
                pos = skip_subblocks(pos)
            else:  # comment / application / plain text: skip
                pos = skip_subblocks(pos)
        elif b == 0x2C:  # image descriptor
            left, top, w, h, ipacked = struct.unpack(
                "<HHHHB", payload[pos : pos + 9]
            )
            pos += 9
            lct = None
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                lct = np.frombuffer(
                    payload[pos : pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            mcs = payload[pos]
            pos += 1
            chunks = []
            while True:
                n = payload[pos]
                pos += 1
                if n == 0:
                    break
                chunks.append(payload[pos : pos + n])
                pos += n
            yield "image", {
                "left": left,
                "top": top,
                "width": w,
                "height": h,
                "interlaced": bool(ipacked & 0x40),
                "lct": lct,
                "min_code_size": mcs,
                "data": b"".join(chunks),
            }
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")


def decode_gif_frames(payload: bytes) -> tuple[list[np.ndarray], list[int]]:
    """Decode every frame to a composited full-canvas (H, W, 3) uint8
    array. Returns (frames, per-frame delay in centiseconds). Disposal
    methods: 0/1 leave, 2 restore-to-background (transparent black per
    modern viewers), 3 restore-previous."""
    events = _parse_blocks(payload)
    kind, screen = next(events)
    assert kind == "screen"
    sw, sh, gct = screen["width"], screen["height"], screen["gct"]
    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    frames: list[np.ndarray] = []
    delays: list[int] = []
    gce: dict = {}
    for kind, ev in events:
        if kind == "gce":
            gce = ev
            continue
        pal = ev["lct"] if ev["lct"] is not None else gct
        if pal is None:
            raise ValueError("image has neither local nor global color table")
        idx = np.frombuffer(
            lzw_decode(ev["data"], ev["min_code_size"]), dtype=np.uint8
        )
        need = ev["width"] * ev["height"]
        if idx.size < need:  # pad truncated streams with index 0
            idx = np.concatenate([idx, np.zeros(need - idx.size, dtype=np.uint8)])
        idx = idx[:need].reshape(ev["height"], ev["width"])
        if ev["interlaced"]:
            idx = _deinterlace(idx)
        if idx.max(initial=0) >= pal.shape[0]:
            raise ValueError("pixel index outside color table")
        rgb = pal[idx]
        t, l = ev["top"], ev["left"]
        region = canvas[t : t + ev["height"], l : l + ev["width"]]
        transparent = gce.get("transparent")
        prev_canvas = canvas.copy() if gce.get("disposal") == 3 else None
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[...] = rgb
        frames.append(canvas.copy())
        delays.append(int(gce.get("delay_cs", 0)))
        disposal = gce.get("disposal", 0)
        if disposal == 2:
            canvas[t : t + ev["height"], l : l + ev["width"]] = 0
        elif disposal == 3 and prev_canvas is not None:
            canvas = prev_canvas
        gce = {}
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames, delays


def decode_gif(payload: bytes) -> np.ndarray:
    """First composited frame as (H, W, 3) uint8."""
    return decode_gif_frames(payload)[0][0]


def gif_info(payload: bytes) -> dict:
    """Header/container metadata without pixel decode (LZW untouched)."""
    events = _parse_blocks(payload)
    _, screen = next(events)
    n_frames = 0
    total_cs = 0
    for kind, ev in events:
        if kind == "image":
            n_frames += 1
        elif kind == "gce":
            total_cs += ev["delay_cs"]
    return {
        "width": screen["width"],
        "height": screen["height"],
        "n_frames": n_frames,
        "duration_s": round(total_cs / 100.0, 6) if total_cs else None,
    }


# ------------------------------------------------------------- encode


def _build_palette(frames: list[np.ndarray]) -> tuple[np.ndarray, list[np.ndarray]]:
    """(palette, per-frame index arrays). Exact when <=256 distinct
    colors across all frames; deterministic uniform 6x7x6 quantization
    otherwise (252 cells)."""
    stacked = np.concatenate([f.reshape(-1, 3) for f in frames])
    colors = np.unique(stacked, axis=0)
    if colors.shape[0] <= 256:
        pal = colors
        idxs = []
        for f in frames:
            flat = f.reshape(-1, 3)
            # vectorized lookup via structured view
            keys = flat[:, 0].astype(np.int32) * 65536 + flat[:, 1].astype(
                np.int32
            ) * 256 + flat[:, 2].astype(np.int32)
            pal_keys = pal[:, 0].astype(np.int32) * 65536 + pal[:, 1].astype(
                np.int32
            ) * 256 + pal[:, 2].astype(np.int32)
            order = np.argsort(pal_keys)
            pos = np.searchsorted(pal_keys[order], keys)
            idxs.append(order[pos].astype(np.uint8).reshape(f.shape[:2]))
        return pal, idxs
    # uniform 6 x 7 x 6 grid
    r_lv = np.linspace(0, 255, 6).round().astype(np.uint8)
    g_lv = np.linspace(0, 255, 7).round().astype(np.uint8)
    b_lv = np.linspace(0, 255, 6).round().astype(np.uint8)
    pal = np.array(
        [(r, g, b) for r in r_lv for g in g_lv for b in b_lv], dtype=np.uint8
    )
    idxs = []
    for f in frames:
        ri = np.clip((f[..., 0].astype(np.int32) * 5 + 127) // 255, 0, 5)
        gi = np.clip((f[..., 1].astype(np.int32) * 6 + 127) // 255, 0, 6)
        bi = np.clip((f[..., 2].astype(np.int32) * 5 + 127) // 255, 0, 5)
        idxs.append((ri * 42 + gi * 6 + bi).astype(np.uint8))
    return pal, idxs


def encode_gif(
    frames: list[np.ndarray] | np.ndarray,
    delay_cs: int = 4,
    loop: int | None = 0,
) -> bytes:
    """Encode one image or an animated sequence as GIF89a with a
    global color table. All frames must share the canvas shape."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if not frames:
        raise ValueError("cannot encode a GIF with zero frames")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape[:2] != (h, w) or f.shape[2] != 3 or f.dtype != np.uint8:
            raise ValueError("all frames must be (H, W, 3) uint8 of one shape")
    pal, idxs = _build_palette(frames)
    n_pal = pal.shape[0]
    gct_bits = max(1, (max(n_pal, 2) - 1).bit_length())
    table_size = 1 << gct_bits
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((gct_bits - 1) & 7), 0, 0)
    out += pal.tobytes() + b"\x00" * (3 * (table_size - n_pal))
    if loop is not None and len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + struct.pack("<H", loop) + b"\x00"
    mcs = max(2, gct_bits)
    for idx in idxs:
        if len(frames) > 1:
            out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(mcs)
        out += _sub_blocks(lzw_encode(idx.tobytes(), mcs))
    out += b"\x3b"
    return bytes(out)
