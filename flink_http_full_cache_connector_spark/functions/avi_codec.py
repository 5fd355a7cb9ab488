"""Vendored, stdlib-only MJPEG-AVI container codec.

Implements the subset of the public AVI RIFF specification (Microsoft
"AVI RIFF File Reference" / OpenDML AVI File Format Extensions, both
public documents) needed for a spec-valid motion-JPEG video file:

    RIFF('AVI '
        LIST('hdrl'
            avih(<MainAVIHeader>)
            LIST('strl' strh(<AVIStreamHeader 'vids'/'MJPG'>)
                        strf(<BITMAPINFOHEADER biCompression='MJPG'>)))
        LIST('movi' 00dc(<JPEG>) ...)
        idx1(<AVIOLDINDEX>))

Every frame chunk is a complete baseline JPEG (decoded by the sibling
vendored ``jpeg_codec``), chunks are WORD-aligned with a pad byte after
odd sizes (RIFF rule), and ``idx1`` carries one keyframe entry per frame
(every MJPEG frame is a keyframe).  The decoder is fail-fast: structural
violations (truncation, wrong fourcc, header/index disagreement) raise
:class:`AviError`, never return garbage — the same contract as the
vendored PNG/GIF/JPEG codecs.

Original implementation from the public spec — mirrors the reference
repo's multimodal ambitions (flink-http-full-cache-connector has no video path at all;
this extends the engine's §2.D multimodal family), not its code.
"""

from __future__ import annotations

import struct

__all__ = ["AviError", "encode_avi_mjpeg", "decode_avi_mjpeg"]


class AviError(ValueError):
    """Structural AVI violation (fail-fast decode contract).

    ``unsupported=True`` marks spec-valid containers outside the vendored
    subset (non-MJPG codec, non-vids streams) vs malformed data."""

    def __init__(self, msg: str, *, unsupported: bool = False):
        super().__init__(msg)
        self.unsupported = unsupported


_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    """RIFF chunk: fourcc + size + payload + WORD-alignment pad byte."""
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(
    width: int, height: int, fps: int, frames: list[bytes]
) -> bytes:
    """Mux JPEG ``frames`` into a spec-valid MJPEG AVI container."""
    if fps <= 0:
        raise AviError("fps must be positive")
    if not frames:
        raise AviError("at least one frame required")
    n = len(frames)
    max_size = max(len(f) for f in frames)
    avih = struct.pack(
        "<10I4x12x",  # MainAVIHeader: 14 DWORDs (last 4 reserved)
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_size * fps,  # dwMaxBytesPerSec (upper bound)
        0,  # dwPaddingGranularity
        _AVIF_HASINDEX,  # dwFlags
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_size,  # dwSuggestedBufferSize
        width,
        height,
    )
    strh = struct.pack(
        "<4s4sI2H8I4h",  # AVIStreamHeader
        b"vids",
        b"MJPG",
        0,  # dwFlags
        0,  # wPriority
        0,  # wLanguage
        0,  # dwInitialFrames
        1,  # dwScale
        fps,  # dwRate  (fps = dwRate / dwScale)
        0,  # dwStart
        n,  # dwLength (frames)
        max_size,  # dwSuggestedBufferSize
        0xFFFFFFFF & -1,  # dwQuality (= -1, driver default)
        0,  # dwSampleSize (0: variable-size samples)
        0, 0, width, height,  # rcFrame
    )
    strf = struct.pack(
        "<I2i2H2I2i2I",  # BITMAPINFOHEADER
        40, width, height, 1, 24, struct.unpack("<I", b"MJPG")[0],
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_payload)
    # idx1 offsets are relative to the start of the 'movi' list type fourcc
    idx_entries, off = [], 4
    for f in frames:
        idx_entries.append(
            struct.pack("<4s3I", b"00dc", _AVIIF_KEYFRAME, off, len(f))
        )
        off += 8 + len(f) + (len(f) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def _need(data: bytes, pos: int, n: int, what: str) -> None:
    if pos + n > len(data):
        raise AviError(f"truncated {what} at byte {pos}")


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_size) honoring WORD alignment."""
    while pos < end:
        _need(data, pos, 8, "chunk header")
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        _need(data, pos + 8, size, f"chunk {fourcc!r} payload")
        yield fourcc, pos + 8, size
        pos += 8 + size + (size % 2)


def decode_avi_mjpeg(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """Demux an MJPEG AVI: returns ``(width, height, fps, jpeg_frames)``.

    Fail-fast: wrong signature, truncation, non-MJPG stream, or an
    ``idx1`` that disagrees with the frames actually present all raise
    :class:`AviError`.
    """
    _need(data, 0, 12, "RIFF header")
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviError("not a RIFF/AVI file")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    if 8 + riff_size > len(data):
        raise AviError("truncated RIFF payload")
    width = height = fps = total = None
    frames: list[bytes] = []
    frame_index: list[tuple[int, int]] = []  # (offset-from-movi-type, size)
    idx_entries: list[tuple[int, int]] | None = None
    for fourcc, p, size in _walk_chunks(data, 12, 8 + riff_size):
        if fourcc == b"LIST":
            _need(data, p, 4, "LIST type")
            ltype = data[p : p + 4]
            if ltype == b"hdrl":
                for f2, p2, s2 in _walk_chunks(data, p + 4, p + size):
                    if f2 == b"avih":
                        if s2 < 40:
                            raise AviError("avih too short")
                        hdr = struct.unpack_from("<10I", data, p2)
                        total, width, height = hdr[4], hdr[8], hdr[9]
                    elif f2 == b"LIST" and data[p2 : p2 + 4] == b"strl":
                        for f3, p3, s3 in _walk_chunks(data, p2 + 4, p2 + s2):
                            if f3 == b"strh":
                                if s3 < 36:
                                    raise AviError("strh too short")
                                fcc_type = data[p3 : p3 + 4]
                                handler = data[p3 + 4 : p3 + 8]
                                if fcc_type != b"vids":
                                    raise AviError(
                                        f"unsupported stream type {fcc_type!r}",
                                        unsupported=True,
                                    )
                                if handler != b"MJPG":
                                    raise AviError(
                                        f"unsupported codec {handler!r}",
                                        unsupported=True,
                                    )
                                scale, rate = struct.unpack_from(
                                    "<2I", data, p3 + 20
                                )
                                if scale == 0:
                                    raise AviError("zero frame-rate scale")
                                if rate % scale:
                                    # legal AVI rational fps outside the
                                    # vendored integer-fps decode subset
                                    raise AviError(
                                        "non-integer frame rate",
                                        unsupported=True,
                                    )
                                fps = rate // scale
            elif ltype == b"movi":
                for f2, p2, s2 in _walk_chunks(data, p + 4, p + size):
                    if f2 == b"00dc":
                        frames.append(data[p2 : p2 + s2])
                        # offset relative to the 'movi' list-type fourcc,
                        # pointing at the chunk HEADER (the idx1 convention
                        # this muxer writes)
                        frame_index.append((p2 - 8 - p, s2))
        elif fourcc == b"idx1":
            if size % 16:
                raise AviError("idx1 size not a multiple of 16")
            idx_entries = []
            for k in range(size // 16):
                ckid = data[p + 16 * k : p + 16 * k + 4]
                if ckid != b"00dc":
                    raise AviError(f"idx1 entry {k}: unexpected id {ckid!r}")
                _, off, sz = struct.unpack_from("<3I", data, p + 16 * k + 4)
                idx_entries.append((off, sz))
    if width is None or fps is None:
        raise AviError("missing avih/strh headers")
    if total != len(frames):
        raise AviError(
            f"avih frame count {total} != movi frames {len(frames)}"
        )
    if idx_entries is not None and idx_entries != frame_index:
        raise AviError(
            f"idx1 disagrees with movi: {len(idx_entries)} entries "
            f"vs {len(frame_index)} frames, or offset/size mismatch"
        )
    return width, height, fps, frames
