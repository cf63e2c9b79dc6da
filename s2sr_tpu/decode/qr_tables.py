"""QR symbol tables (versions 1-10, all four EC levels).

Sources: ISO/IEC 18004 table data (public spec constants). Every entry
is invariant-checked in tests: group sizes must sum to the version's
total codeword count derived from module geometry, and group-2 blocks
carry exactly one more data byte than group 1.

Versions 1-10 cover payloads up to 271 bytes (v10-L) — far beyond the
VIN/serial/URL payloads the decode flow exists for (reference client
`qr-ocr.service.ts` reads tractor plates).
"""

from __future__ import annotations

MAX_VERSION = 10

# EC level two-bit codes as they appear in the (unmasked) format info.
ECL_BITS = {"L": 0b01, "M": 0b00, "Q": 0b11, "H": 0b10}
ECL_FROM_BITS = {v: k for k, v in ECL_BITS.items()}

# version -> level -> (ec_per_block, [(num_blocks, data_codewords), ...])
EC_BLOCKS: dict[int, dict[str, tuple[int, list[tuple[int, int]]]]] = {
    1: {"L": (7, [(1, 19)]), "M": (10, [(1, 16)]),
        "Q": (13, [(1, 13)]), "H": (17, [(1, 9)])},
    2: {"L": (10, [(1, 34)]), "M": (16, [(1, 28)]),
        "Q": (22, [(1, 22)]), "H": (28, [(1, 16)])},
    3: {"L": (15, [(1, 55)]), "M": (26, [(1, 44)]),
        "Q": (18, [(2, 17)]), "H": (22, [(2, 13)])},
    4: {"L": (20, [(1, 80)]), "M": (18, [(2, 32)]),
        "Q": (26, [(2, 24)]), "H": (16, [(4, 9)])},
    5: {"L": (26, [(1, 108)]), "M": (24, [(2, 43)]),
        "Q": (18, [(2, 15), (2, 16)]), "H": (22, [(2, 11), (2, 12)])},
    6: {"L": (18, [(2, 68)]), "M": (16, [(4, 27)]),
        "Q": (24, [(4, 19)]), "H": (28, [(4, 15)])},
    7: {"L": (20, [(2, 78)]), "M": (18, [(4, 31)]),
        "Q": (18, [(2, 14), (4, 15)]), "H": (26, [(4, 13), (1, 14)])},
    8: {"L": (24, [(2, 97)]), "M": (22, [(2, 38), (2, 39)]),
        "Q": (22, [(4, 18), (2, 19)]), "H": (26, [(4, 14), (2, 15)])},
    9: {"L": (30, [(2, 116)]), "M": (22, [(3, 36), (2, 37)]),
        "Q": (20, [(4, 16), (4, 17)]), "H": (24, [(4, 12), (4, 13)])},
    10: {"L": (18, [(2, 68), (2, 69)]), "M": (26, [(4, 43), (1, 44)]),
         "Q": (24, [(6, 19), (2, 20)]), "H": (28, [(6, 15), (2, 16)])},
}

# version -> alignment pattern centre coordinates (row and column)
ALIGNMENT: dict[int, list[int]] = {
    1: [], 2: [6, 18], 3: [6, 22], 4: [6, 26], 5: [6, 30],
    6: [6, 34], 7: [6, 22, 38], 8: [6, 24, 42], 9: [6, 26, 46],
    10: [6, 28, 50],
}

FORMAT_MASK = 0b101010000010010
FORMAT_GEN = 0b10100110111        # BCH(15,5) generator x^10+x^8+x^5+x^4+x^2+x+1


def size_for_version(version: int) -> int:
    return 4 * version + 17


def version_for_size(size: int) -> int:
    if size < 21 or (size - 17) % 4:
        raise ValueError(f"invalid QR size {size}")
    return (size - 17) // 4


def bch_format(data5: int) -> int:
    """15-bit format word (5 data bits + 10 BCH bits), pre-mask."""
    v = data5 << 10
    rem = v
    for i in range(4, -1, -1):
        if rem & (1 << (i + 10)):
            rem ^= FORMAT_GEN << i
    return v | rem


# All 32 valid masked format words, index = (ecl_bits << 3) | mask_id.
FORMAT_WORDS = [bch_format(i) ^ FORMAT_MASK for i in range(32)]


def total_codewords(version: int) -> int:
    """Data+EC codeword count derived from module geometry (spec §7.1)."""
    size = size_for_version(version)
    modules = size * size
    modules -= 3 * 64                      # finder + separator 8×8 each
    align = ALIGNMENT[version]
    n_align = len(align) ** 2 - 3 if align else 0
    modules -= n_align * 25
    timing = (size - 16) * 2
    if align:
        # alignment patterns sitting on the timing rows already counted
        timing -= (len(align) - 2) * 2 * 5
    modules -= timing
    modules -= 31                          # format info + dark module
    if version >= 7:
        modules -= 36
    return modules // 8


def data_capacity(version: int, level: str) -> int:
    ec, groups = EC_BLOCKS[version][level]
    return sum(n * d for n, d in groups)


def mask_fn(mask_id: int):
    return [
        lambda r, c: (r + c) % 2 == 0,
        lambda r, c: r % 2 == 0,
        lambda r, c: c % 3 == 0,
        lambda r, c: (r + c) % 3 == 0,
        lambda r, c: (r // 2 + c // 3) % 2 == 0,
        lambda r, c: (r * c) % 2 + (r * c) % 3 == 0,
        lambda r, c: ((r * c) % 2 + (r * c) % 3) % 2 == 0,
        lambda r, c: ((r + c) % 2 + (r * c) % 3) % 2 == 0,
    ][mask_id]
