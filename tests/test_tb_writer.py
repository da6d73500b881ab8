"""Round-trip tests for the self-contained TensorBoard event writer."""
import numpy as np

from tensoir_tpu.utils.tb_writer import (EventWriter, crc32c, encode_png,
                                         read_events)


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors for CRC32C (Castagnoli)
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA


def test_scalar_roundtrip(tmp_path):
    w = EventWriter(str(tmp_path))
    w.add_scalar("train/loss", 0.125, step=3)
    w.add_scalars({"psnr": 30.5, "mse": 1e-3}, step=4, prefix="train/")
    w.close()

    evs = read_events(w.path)
    assert evs[0]["file_version"] == "brain.Event:2"
    assert evs[1]["step"] == 3
    assert abs(evs[1]["scalars"]["train/loss"] - 0.125) < 1e-7
    assert evs[2]["step"] == 4
    assert abs(evs[2]["scalars"]["train/psnr"] - 30.5) < 1e-4
    assert abs(evs[2]["scalars"]["train/mse"] - 1e-3) < 1e-9


def test_image_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.random((17, 23, 3)).astype(np.float32)
    w = EventWriter(str(tmp_path))
    w.add_image("eval/panel", img, step=7)
    w.close()

    evs = read_events(w.path)
    h, wdt, png = evs[1]["images"]["eval/panel"]
    assert (h, wdt) == (17, 23)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"

    # decode the PNG with matplotlib's independent reader and compare
    import io
    import matplotlib.image as mpimg
    decoded = mpimg.imread(io.BytesIO(png))
    expect = (np.clip(img, 0, 1) * 255 + 0.5).astype(np.uint8) / 255.0
    assert decoded.shape[:2] == (17, 23)
    assert np.allclose(decoded[..., :3], expect, atol=1 / 255.0)


def test_png_uint8_gray():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    png = encode_png(img)
    import io
    import matplotlib.image as mpimg
    decoded = mpimg.imread(io.BytesIO(png))
    assert decoded.shape[:2] == (8, 8)
    assert np.allclose(decoded[..., 0] * 255, img, atol=0.5)
