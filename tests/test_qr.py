"""QR codec + locate + serial-extraction tests.

Oracle strategy (SURVEY §4): interop both directions with OpenCV's QR
encoder/decoder, plus structural invariants on the spec tables and
error-injection roundtrips through our own Reed-Solomon path.
"""

import numpy as np
import pytest

from s2sr_tpu.decode import decode_qr, encode_qr, extract_serial
from s2sr_tpu.decode.galois import rs_decode, rs_encode
from s2sr_tpu.decode.qr_decode import decode_matrix
from s2sr_tpu.decode.qr_encode import render
from s2sr_tpu.decode.qr_tables import (
    EC_BLOCKS, MAX_VERSION, data_capacity, total_codewords,
)
from s2sr_tpu.decode.serial import should_retry_with_enhancement
from s2sr_tpu.decode.service import decode_with_retry

cv2 = pytest.importorskip("cv2")

PAYLOADS = [
    "HELLO-S2SR-12345",
    "KBTX1234567890123",          # VIN-style
    "https://example.com/t?x=1",
    "0123456789",                  # numeric mode
    "A" * 50,                      # alphanumeric, forces higher version
    "mixed Case bytes!",           # byte mode
]

CV2_LEVELS = {
    "L": cv2.QRCodeEncoder_CORRECT_LEVEL_L,
    "M": cv2.QRCodeEncoder_CORRECT_LEVEL_M,
    "Q": cv2.QRCodeEncoder_CORRECT_LEVEL_Q,
    "H": cv2.QRCodeEncoder_CORRECT_LEVEL_H,
}


def cv2_encode(text: str, level: str) -> np.ndarray:
    par = cv2.QRCodeEncoder_Params()
    par.correction_level = CV2_LEVELS[level]
    img = cv2.QRCodeEncoder.create(par).encode(text)
    return img[2:-2, 2:-2] == 0    # strip cv2's quiet zone; dark=True


def bits_to_bytes(bitstr):
    """Pack a '0101...' string into int32 bytes (MSB-first)."""
    bitstr += "0" * (-len(bitstr) % 8)
    return np.array([int(bitstr[i:i + 8], 2)
                     for i in range(0, len(bitstr), 8)], np.int32)


# ---------------------------------------------------------------------------
# tables + Reed-Solomon
# ---------------------------------------------------------------------------


def test_ec_table_invariants():
    for v in range(1, MAX_VERSION + 1):
        total = total_codewords(v)
        for level, (ec, groups) in EC_BLOCKS[v].items():
            got = sum(n * (d + ec) for n, d in groups)
            assert got == total, (v, level, got, total)
            if len(groups) == 2:
                assert groups[1][1] == groups[0][1] + 1, (v, level)


def test_rs_roundtrip_with_errors(rng):
    for _ in range(40):
        k = int(rng.integers(1, 60))
        nsym = int(rng.integers(2, 30))
        data = rng.integers(0, 256, k)
        cw = rs_encode(data, nsym)
        corrupted = cw.copy()
        n_err = int(rng.integers(0, nsym // 2 + 1))
        pos = rng.choice(len(cw), n_err, replace=False)
        for p in pos:
            corrupted[p] ^= int(rng.integers(1, 256))
        decoded, fixed = rs_decode(corrupted, nsym)
        assert (decoded == data).all()
        assert fixed == n_err


def test_rs_uncorrectable_raises():
    cw = rs_encode(np.arange(20) % 256, 10)
    bad = cw.copy()
    bad[:8] ^= 7
    with pytest.raises(ValueError):
        rs_decode(bad, 10)


# ---------------------------------------------------------------------------
# matrix-level interop with cv2
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("payload", PAYLOADS)
@pytest.mark.parametrize("level", ["L", "M", "Q", "H"])
def test_decode_matrix_vs_cv2_encoder(payload, level):
    res = decode_matrix(cv2_encode(payload, level))
    assert res.text == payload
    assert res.ec_level == level


@pytest.mark.parametrize("payload", PAYLOADS)
@pytest.mark.parametrize("level", ["L", "M", "Q", "H"])
def test_encode_qr_vs_cv2_decoder(payload, level):
    img = render(encode_qr(payload, level=level))
    text, _, _ = cv2.QRCodeDetector().detectAndDecode(img)
    assert text == payload


def test_matrix_roundtrip_with_module_errors(rng):
    for payload in PAYLOADS[:3]:
        m = encode_qr(payload, level="H")
        corrupted = m.copy()
        n = m.shape[0]
        for r, c in rng.integers(9, n - 9, size=(6, 2)):
            corrupted[r, c] ^= True
        res = decode_matrix(corrupted)
        assert res.text == payload
        assert res.errors_corrected > 0


def test_mirrored_matrix():
    res = decode_matrix(encode_qr("MIRROR-TEST-123", level="M").T)
    assert res.text == "MIRROR-TEST-123"
    assert res.mirrored


def test_capacity_and_version_selection():
    # encoder picks the smallest version that fits
    m = encode_qr("A", level="L")
    assert m.shape == (21, 21)
    with pytest.raises(ValueError):
        # lowercase forces byte mode (alphanumeric packs ~1.45 chars/byte)
        encode_qr("x" * (data_capacity(MAX_VERSION, "L") + 10), level="L")


# ---------------------------------------------------------------------------
# image-level decode (geometry + binarizer)
# ---------------------------------------------------------------------------

PAYLOAD = "KBTX1234567890123"


@pytest.fixture(scope="module")
def base_img():
    return render(encode_qr(PAYLOAD, level="M"), scale=8, border=4)


def test_image_plain(base_img):
    res = decode_qr(base_img)
    assert res is not None and res.text == PAYLOAD
    assert res.location is not None and len(res.location) == 4


def test_image_inverted(base_img):
    res = decode_qr(255 - base_img)
    assert res is not None and res.text == PAYLOAD
    assert res.inverted


def test_image_rotated(base_img):
    res = decode_qr(np.rot90(base_img).copy())
    assert res is not None and res.text == PAYLOAD
    h, w = base_img.shape
    M = cv2.getRotationMatrix2D((w / 2, h / 2), 25, 0.8)
    rot = cv2.warpAffine(base_img, M, (w, h), borderValue=255)
    res = decode_qr(rot)
    assert res is not None and res.text == PAYLOAD


def test_image_perspective(base_img):
    h, w = base_img.shape
    src = np.float32([[0, 0], [w, 0], [w, h], [0, h]])
    dst = np.float32([[20, 12], [w - 8, 25], [w - 30, h - 15], [6, h - 38]])
    P = cv2.getPerspectiveTransform(src, dst)
    img = cv2.warpPerspective(base_img, P, (w, h), borderValue=255)
    res = decode_qr(img)
    assert res is not None and res.text == PAYLOAD


def test_image_noise_and_blur(base_img, rng):
    img = cv2.GaussianBlur(base_img, (5, 5), 1.2).astype(np.int16)
    img = np.clip(img + rng.normal(0, 12, img.shape), 0, 255).astype(np.uint8)
    res = decode_qr(img)
    assert res is not None and res.text == PAYLOAD


def test_image_embedded_rgb_scene(base_img):
    bg = np.linspace(60, 200, 640).astype(np.uint8)[None, :].repeat(480, 0)
    bg = np.stack([bg] * 3, -1).copy()
    small = cv2.resize(base_img, (200, 200), interpolation=cv2.INTER_AREA)
    bg[140:340, 220:420] = small[..., None]
    res = decode_qr(bg)
    assert res is not None and res.text == PAYLOAD


def test_image_no_code():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (256, 256), dtype=np.uint8)
    assert decode_qr(img) is None


# ---------------------------------------------------------------------------
# serial extraction + retry policy (reference qr-ocr.service.ts semantics)
# ---------------------------------------------------------------------------


def test_extract_serial_vin():
    assert extract_serial("pin: KBTX1234567890123 qty 4") == "KBTX1234567890123"


def test_extract_serial_prefers_vin_length():
    text = "AB12345678 and KBTX1234567890123"
    assert extract_serial(text) == "KBTX1234567890123"


def test_extract_serial_penalises_plain_numbers():
    # a pure number scores below a letter+digit mix of the same length
    assert extract_serial("20240101123456 SN-ABC123456789") == "SN-ABC123456789"


def test_extract_serial_none():
    assert extract_serial("hello world, no serials here") is None


def test_extract_serial_word_confidence_boost():
    words = [{"text": "ZZTOP123456789", "confidence": 95.0}]
    text = "ABCDEF7890123 ZZTOP123456789"
    # equal base scores (both 13-14 chars mixed); confidence tips it
    assert extract_serial(text, words) == "ZZTOP123456789"


def test_retry_policy():
    assert should_retry_with_enhancement(100.0, None)
    assert should_retry_with_enhancement(59.0, "KBTX1234567890123")
    assert should_retry_with_enhancement(95.0, "AB-12")
    assert not should_retry_with_enhancement(95.0, "KBTX1234567890123")


# ---------------------------------------------------------------------------
# full flow with enhance retry
# ---------------------------------------------------------------------------


def test_decode_with_retry_enhance_recovers():
    img = render(encode_qr(PAYLOAD, level="M"), scale=8, border=4)
    tiny = cv2.resize(img, None, fx=0.22, fy=0.22,
                      interpolation=cv2.INTER_AREA)
    tiny = cv2.GaussianBlur(tiny, (3, 3), 0.9)
    assert decode_qr(tiny) is None, "degraded input should not decode raw"

    def upscale_x4(arr):
        return cv2.resize(arr, None, fx=4, fy=4,
                          interpolation=cv2.INTER_CUBIC)

    out = decode_with_retry(tiny, enhance_fn=upscale_x4, try_ocr=False)
    assert out["retried_with_enhancement"]
    assert out["qr"] is not None and out["qr"]["text"] == PAYLOAD
    assert out["serial"] == PAYLOAD
    assert [a["stage"] for a in out["attempts"]] == ["original", "enhanced"]


def test_decode_with_retry_first_pass_hit(base_img):
    calls = []

    def never(arr):
        calls.append(1)
        return arr

    out = decode_with_retry(np.stack([base_img] * 3, -1),
                            enhance_fn=never, try_ocr=False)
    assert out["qr"]["text"] == PAYLOAD
    assert not out["retried_with_enhancement"] and not calls


def test_decode_with_retry_ocr_unavailable_is_loud(base_img):
    out = decode_with_retry(np.stack([base_img] * 3, -1), enhance_fn=None)
    assert out["ocr"]["available"] in (False, True)  # env-dependent
    if not out["ocr"]["available"]:
        assert "reason" in out["ocr"]


def test_fuzz_decode_rate(rng):
    """Seeded robustness fuzz: random payload/level/scale with rotation,
    perspective, or noise per case. Locked at ≥90% decode (current
    implementation measures ~97% on the wider 120-case sweep)."""
    import random
    import string

    random.seed(11)
    ok = 0
    N = 32
    for i in range(N):
        n = int(rng.integers(5, 60))
        payload = "".join(random.choices(
            string.ascii_uppercase + string.digits + "-", k=n))
        level = random.choice("LMQH")
        scale = int(rng.integers(4, 12))
        img = render(encode_qr(payload, level=level), scale=scale, border=4)
        h, w = img.shape
        mode = i % 4
        if mode == 1:
            M = cv2.getRotationMatrix2D(
                (w / 2, h / 2), float(rng.uniform(-40, 40)),
                float(rng.uniform(0.7, 1.0)))
            img = cv2.warpAffine(img, M, (w, h), borderValue=255)
        elif mode == 2:
            def j():
                return float(rng.uniform(0, 0.08))
            src = np.float32([[0, 0], [w, 0], [w, h], [0, h]])
            dst = np.float32([[w * j(), h * j()], [w * (1 - j()), h * j()],
                              [w * (1 - j()), h * (1 - j())],
                              [w * j(), h * (1 - j())]])
            img = cv2.warpPerspective(
                img, cv2.getPerspectiveTransform(src, dst), (w, h),
                borderValue=255)
        elif mode == 3:
            img = cv2.GaussianBlur(img, (3, 3), float(rng.uniform(0.3, 1.0)))
            img = np.clip(img.astype(np.int16)
                          + rng.normal(0, 8, img.shape), 0, 255).astype(np.uint8)
            if i % 8 == 3:
                img = 255 - img
        r = decode_qr(img)
        if r is not None and r.text == payload:
            ok += 1
    assert ok / N >= 0.90, f"fuzz decode rate {ok}/{N}"


def test_encode_explicit_version_overflow_raises():
    """An explicit too-small version must raise, not silently truncate."""
    with pytest.raises(ValueError):
        encode_qr("A" * 60, level="M", version=1)


def test_eci_multibyte_designators_skip_cleanly():
    """2-/3-byte ECI designators (prefix 10/110) must be consumed whole
    or the rest of the stream misaligns."""
    from s2sr_tpu.decode.qr_decode import _parse_stream

    # ECI 2-byte designator (1000000000011010 = ECI 26/UTF-8), then
    # byte-mode "HI", then terminator
    payload = "0111" + "1000000000011010" \
        + "0100" + f"{2:08b}" + f"{ord('H'):08b}" + f"{ord('I'):08b}" + "0000"
    assert _parse_stream(bits_to_bytes(payload), version=1) == "HI"
    # 3-byte designator (prefix 110)
    payload3 = "0111" + "110" + "0" * 21 \
        + "0100" + f"{1:08b}" + f"{ord('X'):08b}" + "0000"
    assert _parse_stream(bits_to_bytes(payload3), version=1) == "X"


# ---------------------------------------------------------------------------
# high versions (11-40) — tables derived against the cv2 oracle
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("version", [11, 14, 17, 21, 24, 28, 32, 36, 40])
@pytest.mark.parametrize("level", ["L", "H"])
def test_high_version_encode_cv2_decodes(version, level):
    payload = f"V{version}{level}-" + "A0" * 20
    det = cv2.QRCodeDetector()
    ok = False
    # cv2's decoder is flaky per (mask, scale) at large sizes — any
    # accepted combination proves the symbol structure is conformant
    for mask in (None, 0, 1):
        m = encode_qr(payload, level=level, version=version, mask=mask)
        assert m.shape == (4 * version + 17,) * 2
        for scale in (4, 6, 8):
            try:
                txt, _, _ = det.detectAndDecode(render(m, scale=scale))
            except cv2.error:
                continue
            if txt == payload:
                ok = True
                break
        if ok:
            break
    assert ok, f"cv2 could not decode our v{version}-{level}"


@pytest.mark.parametrize("version", [11, 14, 17, 24, 28, 32, 36, 40])
@pytest.mark.parametrize("level", ["L", "H"])
def test_high_version_decode_cv2_encoded(version, level):
    # (v21 excluded: cv2's v21 encoder cannot round-trip its own output
    # — misplaced alignment pattern — so there is no oracle symbol)
    payload = f"S2SR{version}{level}" + "7" * 30
    par = cv2.QRCodeEncoder_Params()
    par.version = version
    par.correction_level = CV2_LEVELS[level]
    img = cv2.QRCodeEncoder.create(par).encode(payload)
    res = decode_matrix(img[2:-2, 2:-2] == 0)
    assert res.text == payload
    assert res.version == version
    assert res.ec_level == level


def test_long_payload_selects_high_version():
    payload = "x" * 1200                      # byte mode, needs ~v28-L
    m = encode_qr(payload, level="L")
    version = (m.shape[0] - 17) // 4
    assert version > 20
    res = decode_matrix(m)
    assert res.text == payload


def test_kanji_mode_decode():
    """Kanji segments reassemble Shift-JIS bytes (13-bit packed)."""
    from s2sr_tpu.decode.qr_decode import _parse_stream

    # "あ" = Shift-JIS 0x82A0 → packed (0x82A0-0x8140)=0x0160 →
    # 0x01*0xC0+0x60 = 288
    payload = "1000" + f"{1:08b}" + f"{288:013b}" + "0000"
    assert _parse_stream(bits_to_bytes(payload), version=1) == "あ"


def test_encoder_rejects_bad_mask():
    with pytest.raises(ValueError, match="mask must be 0..7"):
        encode_qr("HELLO", mask=8)
    with pytest.raises(ValueError, match="mask must be 0..7"):
        encode_qr("HELLO", mask=-1)


def test_encoder_unicode_digits_roundtrip():
    """Unicode digits (isdigit()-True, int()-mangled) must NOT take the
    numeric path: the payload round-trips byte-for-byte."""
    from s2sr_tpu.decode.qr_decode import decode_matrix

    for payload in ("١٢٣", "x²"):
        out = decode_matrix(encode_qr(payload, level="M"))
        assert out.text == payload


def test_structured_append_header_is_skipped():
    """A structured-append header (mode 0011 + 16 bits) must not fail
    the decode — the symbol's own content decodes like jsQR does."""
    from s2sr_tpu.decode.qr_decode import _parse_stream

    payload = b"PART-1"
    bits = []
    bits += [0, 0, 1, 1]                       # SA mode
    bits += [0] * 16                           # seq 0/0, parity 0
    bits += [0, 1, 0, 0]                       # byte mode
    bits += [int(c) for c in f"{len(payload):08b}"]
    for b in payload:
        bits += [int(c) for c in f"{b:08b}"]
    bits += [0, 0, 0, 0]                       # terminator
    while len(bits) % 8:
        bits.append(0)
    data = np.packbits(np.array(bits, np.uint8))
    assert _parse_stream(data, version=1) == "PART-1"
