"""Native C++ decode library (data/_native/decode.cc + data/native.py) vs
the PIL reference path. Decode must be bit-identical (same libjpeg/libpng);
resampling within 1 LSB of PIL's fixed-point filters."""

import random
from io import BytesIO

import numpy as np
import pytest
from PIL import Image

from simseg_tpu.data import native
from simseg_tpu.data.transforms import build_transforms
from simseg_tpu.utils.collections import AttrDict

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native decode library unavailable"
)


def _jpeg(w=320, h=240, seed=0, quality=90):
    rng = np.random.default_rng(seed)
    small = rng.integers(0, 255, (h // 5, w // 5, 3), np.uint8)
    arr = np.array(Image.fromarray(small).resize((w, h), Image.BILINEAR))
    buf = BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def _pil(data):
    return Image.open(BytesIO(data)).convert("RGB")


def test_jpeg_full_decode_identical():
    data = _jpeg()
    assert np.array_equal(native.decode(data, fast_scale=False),
                          np.asarray(_pil(data)))


def test_png_and_webp_decode():
    arr = np.asarray(_pil(_jpeg(100, 80)))
    for fmt in ("PNG", "WEBP"):
        buf = BytesIO()
        Image.fromarray(arr).save(buf, fmt, lossless=True) if fmt == "WEBP" \
            else Image.fromarray(arr).save(buf, fmt)
        data = buf.getvalue()
        out = native.decode(data)
        ref = np.asarray(Image.open(BytesIO(data)).convert("RGB"))
        assert np.array_equal(out, ref), fmt


def test_image_size():
    assert native.image_size(_jpeg(123, 77)) == (123, 77)
    with pytest.raises(ValueError):
        native.image_size(b"not an image at all....")


@pytest.mark.parametrize("filt,pil_filt", [
    (native.FILTER_BILINEAR, Image.BILINEAR),
    (native.FILTER_BICUBIC, Image.BICUBIC),
])
def test_resize_matches_pil_within_1(filt, pil_filt):
    data = _jpeg(320, 240)
    ref = np.asarray(_pil(data).resize((144, 144), pil_filt), np.int16)
    out = native.decode(data, out_size=(144, 144), filter=filt,
                        fast_scale=False).astype(np.int16)
    assert np.abs(ref - out).max() <= 1


def test_crop_resize_matches_pil_within_1():
    data = _jpeg(320, 240)
    ref = np.asarray(
        _pil(data).crop((37, 11, 37 + 201, 11 + 145)).resize((96, 96),
                                                             Image.BILINEAR),
        np.int16,
    )
    out = native.decode(data, crop=(37, 11, 201, 145), out_size=(96, 96),
                        fast_scale=False).astype(np.int16)
    assert np.abs(ref - out).max() <= 1


def test_fast_scale_close_to_exact():
    """DCT-domain scaled decode trades exactness for speed; the result must
    stay visually identical (tiny mean error) to the full-decode path."""
    data = _jpeg(1280, 960)
    exact = native.decode(data, out_size=(128, 128), fast_scale=False
                          ).astype(np.int16)
    fast = native.decode(data, out_size=(128, 128), fast_scale=True
                         ).astype(np.int16)
    d = np.abs(exact - fast)
    assert d.mean() < 1.5 and d.max() <= 40


def test_flip():
    data = _jpeg(64, 48)
    a = native.decode(data, out_size=(32, 32), fast_scale=False)
    b = native.decode(data, out_size=(32, 32), flip=True, fast_scale=False)
    assert np.array_equal(b, a[:, ::-1])


def test_batch_decoder_matches_single():
    datas = [_jpeg(seed=i, w=100 + 10 * i, h=90) for i in range(6)]
    crops = [(5, 3, 64, 64)] * 6
    bd = native.BatchDecoder(3)
    out = bd.decode_batch(datas, 48, 48, crops=crops,
                          flips=[i % 2 == 1 for i in range(6)],
                          fast_scale=False)
    assert out.shape == (6, 48, 48, 3)
    for i, d in enumerate(datas):
        single = native.decode(d, crop=crops[i], out_size=(48, 48),
                               flip=i % 2 == 1, fast_scale=False)
        assert np.array_equal(out[i], single), i


def test_grayscale_jpeg():
    arr = np.asarray(_pil(_jpeg(60, 50)))[:, :, 0]
    buf = BytesIO()
    Image.fromarray(arr, "L").save(buf, "JPEG", quality=95)
    data = buf.getvalue()
    out = native.decode(data, fast_scale=False)
    ref = np.asarray(Image.open(BytesIO(data)).convert("RGB"))
    assert np.array_equal(out, ref)


# ------------------------------------------------------------ pipeline glue

def _cfg(train_transforms, **tkeys):
    cfg = AttrDict()
    cfg.data = AttrDict(native_decode=True)
    cfg.transforms = AttrDict()
    cfg.transforms.train_transforms = train_transforms
    cfg.transforms.valid_transforms = ["resize"]
    cfg.transforms.resize = AttrDict(size=64)
    cfg.transforms.random_resize_crop = AttrDict(size=48, scale=[0.6, 1.0])
    cfg.transforms.center_crop = AttrDict(size=40)
    cfg.transforms.random_erasing = AttrDict(reprob=0.0, remode="const",
                                             recount=1)
    for k, v in tkeys.items():
        cfg.transforms[k] = v
    return cfg


def test_pipeline_resize_from_bytes_matches_pil_path():
    cfg = _cfg(["resize"])
    tf = build_transforms(cfg, "valid")
    data = _jpeg(200, 150)
    via_pil = tf(_pil(data)).astype(np.int16)
    via_native = tf.from_bytes(data).astype(np.int16)
    assert np.abs(via_pil - via_native).max() <= 1


def test_pipeline_random_resize_crop_same_seed_same_crop():
    cfg = _cfg(["random_resize_crop", "random_flip"])
    tf = build_transforms(cfg, "train")
    data = _jpeg(200, 150)
    random.seed(1234)
    via_pil = tf(_pil(data)).astype(np.int16)
    random.seed(1234)
    via_native = tf.from_bytes(data).astype(np.int16)
    # same global-rng draws -> same crop box and flip; fast_scale decodes on
    # a smaller DCT grid so pixels differ at lossy-compression level, not
    # geometrically (a wrong crop/flip would push the mean error >20)
    assert via_pil.shape == via_native.shape == (48, 48, 3)
    assert np.abs(via_pil - via_native).mean() < 5.0


def test_pipeline_falls_back_without_native_flag():
    cfg = _cfg(["resize"])
    cfg.data.native_decode = False
    tf = build_transforms(cfg, "train")
    assert tf._head is None
    data = _jpeg(100, 80)
    assert tf.from_bytes(data).shape == (64, 64, 3)


def test_pipeline_unfoldable_head_uses_pil():
    cfg = _cfg(["autoaug", "resize"])
    cfg.transforms.autoaug = AttrDict()
    tf = build_transforms(cfg, "train")
    assert tf._head is None  # autoaug can't fold natively
    data = _jpeg(100, 80)
    random.seed(7)
    out = tf.from_bytes(data)
    assert out.shape == (64, 64, 3)


def test_pipeline_load_from_file(tmp_path):
    cfg = _cfg(["resize"])
    tf = build_transforms(cfg, "train")
    p = tmp_path / "x.jpg"
    p.write_bytes(_jpeg(90, 70))
    assert tf.load(str(p)).shape == (64, 64, 3)


def test_png_alpha_matches_pil_drop_not_composite():
    """PIL convert('RGB') DROPS alpha; libpng's RGB format would composite
    transparent pixels to black. A fully transparent red must stay red."""
    rgba = np.zeros((8, 8, 4), np.uint8)
    rgba[..., 0] = 255  # red
    rgba[..., 3] = 0    # fully transparent
    buf = BytesIO()
    Image.fromarray(rgba, "RGBA").save(buf, "PNG")
    data = buf.getvalue()
    out = native.decode(data)
    ref = np.asarray(Image.open(BytesIO(data)).convert("RGB"))
    assert np.array_equal(out, ref)
    assert out[0, 0, 0] == 255  # red survived


def test_out_of_bounds_crop_clamps_buffer():
    data = _jpeg(64, 48)
    # crop extends past the right edge: C clamps to 64-50=14 wide
    out = native.decode(data, crop=(50, 10, 30, 20), fast_scale=False)
    assert out.shape == (20, 14, 3)
    ref = np.asarray(_pil(data).crop((50, 10, 64, 30)))
    assert np.array_equal(out, ref)
    with pytest.raises(ValueError):
        native.decode(data, crop=(100, 0, 30, 20), fast_scale=False)


def test_pipeline_undersized_crop_falls_back_to_pil():
    """center_crop larger than the image: PIL pads with black; the native
    head must bail to PIL rather than stretch."""
    cfg = _cfg(["center_crop"])
    cfg.transforms.center_crop = AttrDict(size=40)
    tf = build_transforms(cfg, "train")
    data = _jpeg(30, 30)
    via_pil = tf(_pil(data))
    via_bytes = tf.from_bytes(data)
    assert via_bytes.shape == (40, 40, 3)
    assert np.array_equal(via_pil, via_bytes)
    # padded border is black in both
    assert via_bytes[0, 0].tolist() == [0, 0, 0]


def test_interpret_mode_respects_bias():
    """use_flash='interpret' with an attention bias must NOT drop it."""
    import jax.numpy as jnp

    from simseg_tpu.ops.attention import multi_head_attention, padding_bias

    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(2, 256, 64)).astype(np.float32),
                           dtype=jnp.bfloat16) for _ in range(3))
    mask = np.ones((2, 256), np.int32)
    mask[:, 200:] = 0
    bias = padding_bias(jnp.asarray(mask), jnp.float32)
    ref = multi_head_attention(q, k, v, 1, bias, jnp.bfloat16, "never")
    out = multi_head_attention(q, k, v, 1, bias, jnp.bfloat16, "interpret")
    assert np.array_equal(np.asarray(out, np.float32),
                          np.asarray(ref, np.float32))
