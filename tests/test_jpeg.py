"""Baseline JPEG decoder round-trip tests.

No JPEG codec ships in this environment, so the test brings its own
minimal ENCODER (baseline sequential, standard Annex K tables, 4:4:4 and
4:2:0, optional restart markers) and checks decode(encode(img)) ~ img
within quantization tolerance. This validates the Huffman decode loop, DC
prediction, dequant/IDCT, chroma upsampling, and RST handling of
chameleonrt_tpu/utils/jpeg.py against an independent implementation of
the standard (reference role: util/stb_image.h JPEG path)."""

import numpy as np
import pytest

from chameleonrt_tpu.utils.jpeg import ZIGZAG, decode_jpeg

# ---- standard tables (ITU T.81 Annex K) ----
QL = np.array([  # luminance, quality ~50, zigzag applied later
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], np.int32)
QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], np.int32)

DC_L_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_L_SYMS = list(range(12))
DC_C_COUNTS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_C_SYMS = list(range(12))
AC_L_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_L_SYMS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_C_COUNTS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_C_SYMS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_C = np.zeros((8, 8))
for k in range(8):
    for n in range(8):
        _C[k, n] = np.cos((2 * n + 1) * k * np.pi / 16.0) * (
            np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8)
        )


def _codes(counts, syms):
    out = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[syms[i]] = (code, length)
            i += 1
            code += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, length):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.bytes.append(b)
            if b == 0xFF:
                self.bytes.append(0x00)
            self.n -= 8

    def align(self):
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-fill padding per T.81


def _mag(v):
    if v == 0:
        return 0, 0
    n = int(v).bit_length() if v > 0 else int(-v).bit_length()
    code = v if v > 0 else v + (1 << n) - 1
    return code, n


def _encode_block(bw, coeffs, dc_codes, ac_codes, pred):
    diff = int(coeffs[0]) - pred
    code, n = _mag(diff)
    bw.put(dc_codes[n][0], dc_codes[n][1])
    if n:
        bw.put(code, n)
    zz = coeffs[ZIGZAG][1:]
    run = 0
    last_nz = np.nonzero(zz)[0]
    last = last_nz[-1] if len(last_nz) else -1
    for i in range(last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.put(ac_codes[0xF0][0], ac_codes[0xF0][1])
            run -= 16
        code, n = _mag(v)
        sym = (run << 4) | n
        bw.put(ac_codes[sym][0], ac_codes[sym][1])
        bw.put(code, n)
        run = 0
    if last < 62:
        bw.put(ac_codes[0x00][0], ac_codes[0x00][1])
    return int(coeffs[0])


def _fdct_quant(plane, q):
    h, w = plane.shape
    blocks = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).astype(np.float64) - 128.0
    co = np.einsum("ik,mnkl,jl->mnij", _C, blocks, _C, optimize=True)
    qn = q.reshape(8, 8)
    return np.round(co / qn).astype(np.int32)


def encode_jpeg(img, subsample=False, restart_interval=0):
    """Minimal baseline encoder: img (H, W, 3) uint8 -> JPEG bytes."""
    import struct

    h, w, _ = img.shape
    f = img.astype(np.float32)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    cb = -0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2] + 128
    cr = 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2] + 128

    hs, vs = (2, 2) if subsample else (1, 1)
    mw, mh = 8 * hs, 8 * vs
    ph = -(-h // mh) * mh
    pw = -(-w // mw) * mw

    def pad(p):
        return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")

    y = pad(y)
    cb = pad(cb)
    cr = pad(cr)
    if subsample:
        cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

    yb = _fdct_quant(y, QL)
    cbb = _fdct_quant(cb, QC)
    crb = _fdct_quant(cr, QC)

    dcl = _codes(DC_L_COUNTS, DC_L_SYMS)
    dcc = _codes(DC_C_COUNTS, DC_C_SYMS)
    acl = _codes(AC_L_COUNTS, AC_L_SYMS)
    acc = _codes(AC_C_COUNTS, AC_C_SYMS)

    bw = _BitWriter()
    mcux = pw // mw
    mcuy = ph // mh
    preds = [0, 0, 0]
    out_chunks = []
    rst = 0
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            bw.align()
            out_chunks.append(bytes(bw.bytes))
            out_chunks.append(bytes([0xFF, 0xD0 + (rst % 8)]))
            rst += 1
            bw = _BitWriter()
            preds = [0, 0, 0]
        my, mx = divmod(m, mcux)
        for by in range(vs):
            for bx in range(hs):
                blk = yb[my * vs + by, mx * hs + bx].reshape(64)
                preds[0] = _encode_block(bw, blk, dcl, acl, preds[0])
        preds[1] = _encode_block(bw, cbb[my, mx].reshape(64), dcc, acc, preds[1])
        preds[2] = _encode_block(bw, crb[my, mx].reshape(64), dcc, acc, preds[2])
    bw.align()
    out_chunks.append(bytes(bw.bytes))
    scan_bytes = b"".join(out_chunks)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    def dht(tc, th, counts, syms):
        return seg(0xC4, bytes([tc << 4 | th] + counts + list(syms)))

    parts = [b"\xff\xd8"]
    parts.append(seg(0xDB, bytes([0]) + bytes(QL[ZIGZAG].astype(np.uint8))))
    parts.append(seg(0xDB, bytes([1]) + bytes(QC[ZIGZAG].astype(np.uint8))))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, hs << 4 | vs, 0, 2, 0x11, 1, 3, 0x11, 1])
    parts.append(seg(0xC0, sof))
    parts.append(dht(0, 0, DC_L_COUNTS, DC_L_SYMS))
    parts.append(dht(1, 0, AC_L_COUNTS, AC_L_SYMS))
    parts.append(dht(0, 1, DC_C_COUNTS, DC_C_SYMS))
    parts.append(dht(1, 1, AC_C_COUNTS, AC_C_SYMS))
    if restart_interval:
        parts.append(seg(0xDD, struct.pack(">H", restart_interval)))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    parts.append(seg(0xDA, sos))
    parts.append(scan_bytes)
    parts.append(b"\xff\xd9")
    return b"".join(parts)


def _test_image(h, w, seed=0):
    r = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            128 + 90 * np.sin(xx / 7.0) * np.cos(yy / 11.0),
            128 + 90 * np.cos(xx / 5.0),
            60 + (xx + yy) % 140,
        ],
        axis=-1,
    )
    img += r.normal(0, 4, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("size", [(8, 8), (16, 24), (37, 53)])
def test_roundtrip_444(size):
    img = _test_image(*size, seed=1)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == img.shape
    err = np.abs(out.astype(np.int32) - img.astype(np.int32)).mean()
    assert err < 12.0, f"mean abs error {err}"


def test_roundtrip_420():
    img = _test_image(40, 56, seed=2)
    out = decode_jpeg(encode_jpeg(img, subsample=True))
    assert out.shape == img.shape
    err = np.abs(out.astype(np.int32) - img.astype(np.int32)).mean()
    assert err < 18.0, f"mean abs error {err}"


def test_restart_markers():
    img = _test_image(48, 64, seed=3)
    plain = decode_jpeg(encode_jpeg(img))
    rst = decode_jpeg(encode_jpeg(img, restart_interval=3))
    np.testing.assert_array_equal(plain, rst)


def test_flat_color_and_gradients():
    img = np.full((24, 24, 3), 200, np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert np.abs(out.astype(int) - 200).max() <= 6


def test_lossless_sof_rejected_loudly():
    """Unsupported frame types (e.g. SOF3 lossless) must fail with a clear
    error, not garbage output."""
    img = _test_image(16, 16)
    data = bytearray(encode_jpeg(img))
    idx = data.find(b"\xff\xc0")
    data[idx + 1] = 0xC3  # rewrite SOF0 -> SOF3 (lossless)
    with pytest.raises(ValueError, match="unsupported JPEG type"):
        decode_jpeg(bytes(data))


def test_image_io_dispatch(tmp_path):
    from chameleonrt_tpu.utils.image_io import read_image, read_image_or_placeholder

    img = _test_image(20, 20, seed=4)
    p = tmp_path / "t.jpg"
    p.write_bytes(encode_jpeg(img))
    out = read_image(str(p))
    assert out.shape == (20, 20, 3)
    # corrupt file falls back to placeholder, not an exception
    p2 = tmp_path / "bad.jpg"
    p2.write_bytes(b"\xff\xd8garbage")
    ph = read_image_or_placeholder(str(p2), warn=False)
    assert ph.shape == (4, 4, 3)


def _pil_roundtrip_case(img, **save_kw):
    PIL = pytest.importorskip("PIL.Image")
    import io

    buf = io.BytesIO()
    PIL.fromarray(img).save(buf, "JPEG", **save_kw)
    data = buf.getvalue()
    mine = decode_jpeg(data)
    ref = np.asarray(PIL.open(io.BytesIO(data)).convert("RGB"))
    return mine, ref, data


def _test_img():
    yy, xx = np.mgrid[0:80, 0:112].astype(np.float32)
    img = np.stack(
        [128 + 100 * np.sin(xx * 0.1), 128 + 100 * np.cos(yy * 0.13), (xx + yy) % 256],
        -1,
    )
    img[20:50, 30:80] = [220, 40, 40]
    return np.clip(img, 0, 255).astype(np.uint8)


def test_progressive_jpeg_matches_libjpeg():
    """Progressive (SOF2) decoding — DC/AC first+refine scans with
    successive approximation and EOB runs (ITU T.81 Annex G; the
    reference's stb decodes progressive too, util/stb_image.h). Compared
    against libjpeg via PIL at 4:4:4 where upsampling cannot differ."""
    mine, ref, data = _pil_roundtrip_case(
        _test_img(), quality=85, progressive=True, subsampling=0
    )
    assert data[2:4] != b"\xff\xc0"  # actually progressive
    assert b"\xff\xc2" in data[:200]
    diff = np.abs(mine.astype(int) - ref.astype(int))
    assert diff.max() <= 4, diff.max()


def test_progressive_jpeg_420_matches_own_baseline():
    """Progressive and baseline encodings of the same image must decode to
    nearly identical pixels through OUR decoder (coefficients are
    identical; only encoder scan structure differs) — covers 4:2:0
    progressive without depending on PIL's different chroma upsampling."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    img = _test_img()
    outs = []
    for prog in (False, True):
        buf = io.BytesIO()
        PIL.fromarray(img).save(
            buf, "JPEG", quality=85, progressive=prog, subsampling=2
        )
        outs.append(decode_jpeg(buf.getvalue()).astype(int))
    diff = np.abs(outs[0] - outs[1])
    assert diff.max() <= 1, diff.max()


def test_progressive_grayscale():
    PIL = pytest.importorskip("PIL.Image")
    import io

    img = _test_img()[:, :, 0]
    buf = io.BytesIO()
    PIL.fromarray(img).save(buf, "JPEG", quality=90, progressive=True)
    mine = decode_jpeg(buf.getvalue())
    ref = np.asarray(PIL.open(buf))
    assert mine.shape == img.shape + (1,)
    assert np.abs(mine[:, :, 0].astype(int) - ref.astype(int)).max() <= 2


class TestProductEncoder:
    """The product encoder (utils/jpeg_encode.py — stb_image_write's encode
    role, for the web viewer's MJPEG stream) round-trips through the product
    decoder within quantization error."""

    def _psnr(self, a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return 10 * np.log10(255.0**2 / max(mse, 1e-12))

    def test_roundtrip_rgb_gradient(self):
        from chameleonrt_tpu.utils.jpeg_encode import encode_jpeg as product_encode

        h, w = 72, 100  # non-multiple-of-8 on both sides
        y, x = np.mgrid[0:h, 0:w]
        img = np.stack(
            [
                (255 * x / w).astype(np.uint8),
                (255 * y / h).astype(np.uint8),
                ((x + y) % 256).astype(np.uint8),
            ],
            axis=2,
        )
        out = decode_jpeg(product_encode(img, quality=90))
        assert out.shape == img.shape
        assert self._psnr(img, out) > 30.0

    def test_roundtrip_quality_ladder(self):
        from chameleonrt_tpu.utils.jpeg_encode import encode_jpeg as product_encode

        rng = np.random.default_rng(3)
        # smooth random field (JPEG-friendly)
        img = rng.integers(0, 255, (4, 6, 3)).astype(np.uint8)
        img = np.kron(img, np.ones((16, 16, 1))).astype(np.uint8)
        prev_len = None
        for q in (50, 80, 95):
            data = product_encode(img, quality=q)
            out = decode_jpeg(data)
            assert self._psnr(img, out) > (28 if q == 50 else 33)
            if prev_len is not None:
                assert len(data) >= prev_len * 0.8  # higher q, no big shrink
            prev_len = len(data)

    def test_gray_input(self):
        from chameleonrt_tpu.utils.jpeg_encode import encode_jpeg as product_encode

        img = np.tile(np.linspace(0, 255, 64, dtype=np.uint8), (64, 1))
        out = decode_jpeg(product_encode(img, quality=92))
        assert out.shape == (64, 64, 3)
        assert np.abs(out.astype(int).mean(axis=2) - img.astype(int)).mean() < 4
