"""GIF89a codec from first principles: real LZW compression both
directions, stdlib-only — the palette-image member of the decode
family (BMP/PPM/WAV/PNG/JPEG in operators/multimodal.py and
operators/jpeg.py, AVI in operators/video.py).

GIF is lossless (palette indices LZW-coded), so decoded pixel stats
are EXACT integer functions of the synthesized image — the same
first-principles oracle contract as BMP/PPM: DuckDB recomputes the
per-channel means from the pixel formula and the value hash must
match bit-for-bit.

Scope: GIF87a/89a, global or local color table, single image frame
(the first image block is decoded; animation frames beyond it are
ignored), 4-pass interlace supported, extensions skipped per spec.
Malformed
payloads raise ValueError — callers (decode_media) turn poison into
decoded=false rows, never dead tasks.
"""

from __future__ import annotations

__all__ = ["encode_gif", "decode_gif"]


# ---------------------------------------------------------------------------
# LZW (GIF variant): LSB-first bit packing, variable code width
# starting at min_code_size+1, clear/EOI codes, 12-bit cap.
# ---------------------------------------------------------------------------


def _lzw_encode(indices: list[int], mcs: int) -> bytes:
    clear = 1 << mcs
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = mcs + 1
    emit(clear, width)
    w: tuple[int, ...] = ()
    for k in indices:
        if not 0 <= k < clear:
            raise ValueError(f"palette index {k} out of range for {mcs}-bit LZW")
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = mcs + 1
        w = (k,)
    if w:
        emit(table[w], width)
        # The decoder appends a table entry for every data code after
        # the first following a clear — including this final one, for
        # which the encoder assigns nothing. When that phantom append
        # lands exactly on a 2^width boundary the decoder widens before
        # reading the next code, so EOI must be emitted one bit wider.
        # (Unreachable when this emit is the first after a clear: then
        # next_code == clear+2 < 2^(mcs+1) for every legal mcs >= 2.)
        if next_code == (1 << width) and width < 12:
            width += 1
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, mcs: int, max_pixels: int) -> list[int]:
    clear = 1 << mcs
    eoi = clear + 1
    pos = 0  # bit position

    def read_code(width: int) -> int:
        nonlocal pos
        end = pos + width
        if (end + 7) // 8 > len(data):
            raise ValueError("truncated LZW stream")
        byte_start = pos // 8
        chunk = int.from_bytes(
            data[byte_start : (end + 7) // 8], "little"
        )
        code = (chunk >> (pos % 8)) & ((1 << width) - 1)
        pos = end
        return code

    out: list[int] = []
    table: list[tuple[int, ...]] = [(i,) for i in range(clear)] + [(), ()]
    width = mcs + 1
    prev: tuple[int, ...] | None = None
    while True:
        code = read_code(width)
        if code == clear:
            table = [(i,) for i in range(clear)] + [(), ()]
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("LZW: first code not in table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):
            entry = prev + (prev[0],)  # the KwKwK case
            table.append(entry)
        else:
            raise ValueError("LZW: code beyond table")
        out.extend(entry)
        if len(out) > max_pixels:
            raise ValueError("LZW output exceeds image size")
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    return out


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------


def _interlace_row_order(height: int) -> list[int]:
    """GIF 4-pass interlace: the order image rows appear in the LZW
    stream — pass 1 every 8th row from 0, pass 2 every 8th from 4,
    pass 3 every 4th from 2, pass 4 every odd row."""
    order: list[int] = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, height, step))
    return order


def encode_gif(width: int, height: int, palette: list[tuple[int, int, int]],
               indices: list[int], *, interlace: bool = False) -> bytes:
    """Build a GIF89a with one image frame and a global color table.
    ``palette`` holds up to 256 (r, g, b) triples; ``indices`` are
    row-major palette indices, len == width*height. Real LZW. With
    ``interlace=True`` the rows are written in 4-pass interlace order
    and the image descriptor's interlace flag is set."""
    if width <= 0 or height <= 0:
        raise ValueError("degenerate GIF dimensions")
    if not 1 <= len(palette) <= 256:
        raise ValueError("palette must hold 1..256 colors")
    if len(indices) != width * height:
        raise ValueError("indices length must be width*height")
    bits = max(1, (max(len(palette) - 1, 1)).bit_length())
    table_size = 1 << bits
    mcs = max(2, bits)  # GIF forbids min code size 1
    out = bytearray(b"GIF89a")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out.append(0x80 | ((bits - 1) & 7))  # GCT present, size bits
    out += b"\x00\x00"  # background index, aspect
    for i in range(table_size):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        out += bytes((r & 0xFF, g & 0xFF, b & 0xFF))
    out.append(0x2C)  # image descriptor
    out += b"\x00\x00\x00\x00"  # left, top
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out.append(0x40 if interlace else 0)  # no local color table
    out.append(mcs)
    if interlace:
        indices = [
            indices[r * width + c]
            for r in _interlace_row_order(height)
            for c in range(width)
        ]
    lzw = _lzw_encode(indices, mcs)
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif(payload: bytes) -> dict:
    """Decode the first image frame of a GIF87a/89a: block walk,
    sub-block reassembly, LZW decompress, palette lookup. Returns the
    decode_media stats dict (width/height + exact per-channel means).
    Interlaced images are de-interlaced (4-pass row shuffle) so the
    pixel layout is row-major before stats are taken."""
    import numpy as np

    data = bytes(payload)
    if len(data) < 13 or data[:4] != b"GIF8" or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF payload")
    packed = data[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        if pos + 3 * n > len(data):
            raise ValueError("truncated global color table")
        gct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            if pos >= len(data):
                raise ValueError("truncated GIF extension")
            pos += 1
            while True:
                if pos >= len(data):
                    raise ValueError("truncated GIF extension blocks")
                n = data[pos]
                pos += 1 + n
                if n == 0:
                    break
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("truncated image descriptor")
        w = int.from_bytes(data[pos + 4 : pos + 6], "little")
        h = int.from_bytes(data[pos + 6 : pos + 8], "little")
        ipacked = data[pos + 8]
        pos += 9
        interlaced = bool(ipacked & 0x40)
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 7)
            if pos + 3 * n > len(data):
                raise ValueError("truncated local color table")
            ct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image has no color table")
        if w <= 0 or h <= 0:
            raise ValueError("degenerate GIF dimensions")
        if pos >= len(data):
            raise ValueError("truncated GIF before LZW data")
        mcs = data[pos]
        pos += 1
        if not 2 <= mcs <= 11:
            raise ValueError(f"invalid LZW min code size {mcs}")
        lzw = bytearray()
        while True:
            if pos >= len(data):
                raise ValueError("truncated GIF image data")
            n = data[pos]
            pos += 1
            if n == 0:
                break
            if pos + n > len(data):
                raise ValueError("truncated GIF sub-block")
            lzw += data[pos : pos + n]
            pos += n
        indices = _lzw_decode(bytes(lzw), mcs, w * h)
        if len(indices) < w * h:
            raise ValueError("LZW stream ended before image filled")
        idx = np.asarray(indices[: w * h], dtype=np.int64)
        if interlaced:
            # Stream rows arrive in 4-pass order; scatter them back to
            # their true image rows for a row-major layout.
            rows = idx.reshape(h, w)
            ordered = np.empty_like(rows)
            ordered[np.asarray(_interlace_row_order(h))] = rows
            idx = ordered.reshape(-1)
        if int(idx.max(initial=0)) >= len(ct):
            raise ValueError("GIF pixel index beyond color table")
        rgb = ct[idx].astype(np.float64)
        means = rgb.mean(axis=0)
        return {
            "width": w,
            "height": h,
            "mean_r": float(means[0]),
            "mean_g": float(means[1]),
            "mean_b": float(means[2]),
        }
    raise ValueError("GIF holds no image frame")
