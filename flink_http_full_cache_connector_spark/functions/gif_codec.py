"""Pure-stdlib GIF87a/89a codec (decode + encode) — no pillow.

The multimodal operators treat media as opaque binary columns and decode
inside Arrow batches (``operators/multimodal.py``).  This module provides
the GIF leg of that decode for environments without pillow, implementing
the public GIF89a specification from stdlib primitives only, the same way
``png_codec.py`` implements the W3C PNG spec: variable-width LSB-first
LZW with a growing dictionary (clear/EOI codes, 12-bit cap, deferred
clear tolerated), global/local color tables, interlaced row ordering,
and sub-block framing.

Reference parity note: the reference connector (/root/reference, a Flink
HTTP lookup cache, README.md:1-40) has no media surface at all — this
module belongs to the large-scale training-data-pipeline operator set the
build target adds on top (SURVEY.md §2.D multimodal).

Scope (fail-fast, never silent garbage — raises :class:`GifError`):

- decodes the FIRST image frame; the frame must cover the full logical
  screen (animation composition is out of scope),
- 87a and 89a signatures, global or local color table (one must exist),
- interlaced and non-interlaced,
- extensions are skipped per the sub-block grammar (GCE transparency is
  NOT applied — first-frame pixels are fully specified by the palette).

The encoder exists so tests and the registered pipeline query can build
spec-valid payloads deterministically: real LZW (not the uncompressed
trick), palette built from the unique colors (≤256), optional interlace.
"""

from __future__ import annotations

import struct

__all__ = ["GifError", "decode_gif", "encode_gif"]

_MAX_CODE_WIDTH = 12
_DICT_LIMIT = 1 << _MAX_CODE_WIDTH  # 4096


class GifError(ValueError):
    """Malformed or unsupported GIF payload (fail-fast decode contract).

    ``unsupported=True`` marks spec-valid streams outside the vendored
    subset vs structurally malformed data (attribute, not message text)."""

    def __init__(self, msg: str, *, unsupported: bool = False):
        super().__init__(msg)
        self.unsupported = unsupported


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------

def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytearray:
    """Variable-width LSB-first GIF-LZW → index stream (``expected`` pixels).

    Stops at the EOI code or when ``expected`` indices are produced (some
    real-world encoders omit EOI); anything structurally invalid raises.
    """
    if not 2 <= min_code_size <= 11:
        raise GifError(f"invalid LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes((i,)) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = 0
    pos = 0
    n = len(data)
    while len(out) < expected:
        while nbits < width:
            if pos >= n:
                raise GifError("truncated LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            del table[eoi + 1 :]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise GifError(f"LZW code {code} before any dictionary entry")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise GifError(f"LZW code {code} beyond dictionary size {len(table)}")
        out += entry
        if prev is not None and len(table) < _DICT_LIMIT:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry
    if len(out) != expected:
        raise GifError(
            f"LZW stream produced {len(out)} indices, expected {expected}"
        )
    return out


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Index stream → variable-width LSB-first GIF-LZW bytes (real LZW)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes((i,)): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    w = b""
    for idx in indices:
        wk = w + bytes((idx,))
        if wk in table:
            w = wk
            continue
        emit(table[w])
        if next_code < _DICT_LIMIT:
            table[wk] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < _MAX_CODE_WIDTH:
                # the entry just added needs one more bit; the DECODER
                # widens after adding the same entry, i.e. before reading
                # the next code — mirror that boundary exactly
                width += 1
        else:
            emit(clear)
            # NOTE: emit() above used the pre-reset width — correct: the
            # decoder reads the clear code at the old width, then resets
            table = {bytes((i,)): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes((idx,))
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: list[bytes], height: int) -> list[bytes]:
    ordered: list[bytes | None] = [None] * height
    it = iter(rows)
    for start, step in _INTERLACE_PASSES:
        for y in range(start, height, step):
            ordered[y] = next(it)
    return ordered  # type: ignore[return-value]


def _read_subblocks(data: bytes, pos: int) -> tuple[bytearray, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise GifError("truncated sub-block chain")
        size = data[pos]
        pos += 1
        if size == 0:
            return out, pos
        if pos + size > len(data):
            raise GifError("truncated sub-block")
        out += data[pos : pos + size]
        pos += size


def decode_gif(data: bytes) -> tuple[int, int, str, bytearray]:
    """Decode the first frame of a GIF payload → ``(w, h, "RGB", pixels)``.

    ``pixels`` is row-major RGB, ``w*h*3`` bytes.  Raises :class:`GifError`
    on a bad signature, truncation, missing color table, LZW corruption,
    wrong pixel count, or a first frame that does not cover the logical
    screen — fail-fast, never a garbage image.
    """
    if len(data) < 13:
        raise GifError("not a GIF: too short")
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF: bad signature")
    width, height, packed, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    if width == 0 or height == 0:
        raise GifError("zero logical screen dimension")
    pos = 13
    global_palette: bytes | None = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(data):
            raise GifError("truncated global color table")
        global_palette = data[pos : pos + 3 * n]
        pos += 3 * n
    while True:
        if pos >= len(data):
            raise GifError("truncated: no image descriptor before EOF")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            raise GifError("no image frame before trailer")
        if block == 0x21:  # extension: label + sub-blocks
            if pos >= len(data):
                raise GifError("truncated extension")
            pos += 1
            _, pos = _read_subblocks(data, pos)
            continue
        if block != 0x2C:
            raise GifError(f"unexpected block introducer 0x{block:02x}")
        break
    if pos + 9 > len(data):
        raise GifError("truncated image descriptor")
    left, top, fw, fh, fpacked = struct.unpack("<HHHHB", data[pos : pos + 9])
    pos += 9
    if (left, top, fw, fh) != (0, 0, width, height):
        # spec-valid GIF (partial first frame is legal GIF89a) outside the
        # vendored full-screen-frame subset — unsupported, not malformed
        raise GifError(
            "first frame does not cover the logical screen "
            f"(frame {fw}x{fh}@{left},{top} vs screen {width}x{height})",
            unsupported=True,
        )
    palette = global_palette
    if fpacked & 0x80:
        n = 2 << (fpacked & 0x07)
        if pos + 3 * n > len(data):
            raise GifError("truncated local color table")
        palette = data[pos : pos + 3 * n]
        pos += 3 * n
    if palette is None:
        raise GifError("no color table (neither global nor local)")
    if pos >= len(data):
        raise GifError("truncated before LZW minimum code size")
    min_code_size = data[pos]
    pos += 1
    lzw, pos = _read_subblocks(data, pos)
    indices = _lzw_decode(bytes(lzw), min_code_size, width * height)
    n_colors = len(palette) // 3
    mx = max(indices)
    if mx >= n_colors:
        raise GifError(f"palette index {mx} out of range ({n_colors} colors)")
    if fpacked & 0x40:  # interlaced: reorder rows
        rows = [
            bytes(indices[y * width : (y + 1) * width]) for y in range(height)
        ]
        indices = bytearray(b"".join(_deinterlace(rows, height)))
    pixels = bytearray(width * height * 3)
    for i, idx in enumerate(indices):
        pixels[3 * i : 3 * i + 3] = palette[3 * idx : 3 * idx + 3]
    return width, height, "RGB", pixels


def encode_gif(
    width: int,
    height: int,
    pixels: bytes,
    *,
    mode: str = "RGB",
    interlace: bool = False,
) -> bytes:
    """Encode row-major RGB pixels as a spec-valid GIF89a (real LZW).

    The palette is the sorted set of unique colors; more than 256 unique
    colors raises (GIF is palette-indexed by design — quantization is a
    modeling choice this engine refuses to make silently).
    """
    if mode != "RGB":
        raise GifError(f"unsupported encode mode {mode!r} (RGB only)")
    if len(pixels) != width * height * 3:
        raise GifError(
            f"pixel buffer is {len(pixels)} bytes, expected {width * height * 3}"
        )
    colors = sorted(
        {bytes(pixels[i : i + 3]) for i in range(0, len(pixels), 3)}
    )
    if len(colors) > 256:
        raise GifError(f"{len(colors)} unique colors exceed the GIF palette")
    index_of = {c: i for i, c in enumerate(colors)}
    bits = max(2, (len(colors) - 1).bit_length() or 1)
    table_size = 1 << bits
    palette = b"".join(colors) + b"\x00\x00\x00" * (table_size - len(colors))
    indices = bytes(
        index_of[bytes(pixels[i : i + 3])] for i in range(0, len(pixels), 3)
    )
    if interlace:
        rows = [
            indices[y * width : (y + 1) * width] for y in range(height)
        ]
        order = [
            y for start, step in _INTERLACE_PASSES
            for y in range(start, height, step)
        ]
        indices = b"".join(rows[y] for y in order)
    min_code_size = bits
    lzw = _lzw_encode(indices, min_code_size)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (bits - 1), 0, 0)
    out += palette
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, width, height, 0x40 if interlace else 0
    )
    out.append(min_code_size)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
