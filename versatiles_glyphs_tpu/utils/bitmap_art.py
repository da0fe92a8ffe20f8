"""Bitmap → text art helpers for golden-bitmap tests.

Same encodings as `/root/reference/src/utils/decode_bitmap.rs:15-78`:
digit art maps each byte to ``(v*100)//256`` zero-padded two digits;
ASCII art maps intensity ranges to 2-char shade blocks.
"""

from __future__ import annotations


def bitmap_as_digit_art(bitmap, width: int) -> list[str]:
    rows = []
    for r0 in range(0, len(bitmap), width):
        row = bitmap[r0 : r0 + width]
        rows.append(" ".join(f"{min((int(v) * 100) // 256, 99):02d}" for v in row))
    return rows


def _shade(v: int) -> str:
    if v <= 60:
        return "  "
    if v <= 120:
        return "░░"
    if v <= 180:
        return "▒▒"
    if v <= 240:
        return "▓▓"
    return "█"


def bitmap_as_ascii_art(bitmap, width: int) -> list[str]:
    rows = []
    for r0 in range(0, len(bitmap), width):
        row = bitmap[r0 : r0 + width]
        rows.append("".join(_shade(int(v)) for v in row))
    return rows
