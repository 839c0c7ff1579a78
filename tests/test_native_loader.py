"""Native C++ TFRecord/tf.Example reader vs TensorFlow's own writer/parsers."""

import os

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from roboticattack_tpu.data.native_loader import NativeRLDSReader, decode_jpeg, load_library


@pytest.fixture(scope="module")
def record_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tfr") / "data.tfrecord")
    rng = np.random.default_rng(0)
    images, actions, langs = [], [], []
    with tf.io.TFRecordWriter(path) as w:
        for i in range(5):
            img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
            jpg = tf.io.encode_jpeg(img).numpy()
            action = rng.standard_normal(7).astype(np.float32)
            lang = f"instruction number {i}".encode()
            ex = tf.train.Example(features=tf.train.Features(feature={
                "image": tf.train.Feature(bytes_list=tf.train.BytesList(value=[jpg])),
                "action": tf.train.Feature(float_list=tf.train.FloatList(value=action)),
                "step": tf.train.Feature(int64_list=tf.train.Int64List(value=[i, i * 10])),
                "language": tf.train.Feature(bytes_list=tf.train.BytesList(value=[lang])),
            }))
            w.write(ex.SerializeToString())
            images.append(jpg)
            actions.append(action)
            langs.append(lang)
    return path, images, actions, langs


def test_library_builds():
    lib = load_library()
    assert lib is not None


def test_read_examples_match_tf(record_file):
    path, images, actions, langs = record_file
    reader = NativeRLDSReader([path])
    count = 0
    for i, ex in enumerate(reader):
        np.testing.assert_allclose(ex.feature("action"), actions[i], rtol=1e-6)
        np.testing.assert_array_equal(ex.feature("step"), [i, i * 10])
        assert ex.feature("language") == langs[i]
        assert ex.feature("image") == images[i]
        count += 1
    assert count == 5
    reader.close()


def test_jpeg_decode_matches_pil(record_file):
    path, images, _, _ = record_file
    from PIL import Image
    import io

    ours = decode_jpeg(images[0])
    want = np.asarray(Image.open(io.BytesIO(images[0])).convert("RGB"))
    assert ours.shape == want.shape
    # both use system libjpeg; allow tiny IDCT variation
    assert np.mean(np.abs(ours.astype(int) - want.astype(int))) < 1.0


def test_multiple_files_and_missing_key(record_file, tmp_path):
    path, _, _, _ = record_file
    reader = NativeRLDSReader([path, path])
    examples = list(reader)
    assert len(examples) == 10
    with pytest.raises(KeyError):
        examples[0].feature("nope")
    reader.close()

    # nonexistent file -> empty iterator, no crash
    empty = NativeRLDSReader([str(tmp_path / "missing.tfrecord")])
    assert list(empty) == []


def test_prefetch_throughput_smoke(record_file, tmp_path):
    """Many records through the ring without loss or reorder."""
    path = str(tmp_path / "big.tfrecord")
    with tf.io.TFRecordWriter(path) as w:
        for i in range(500):
            ex = tf.train.Example(features=tf.train.Features(feature={
                "idx": tf.train.Feature(int64_list=tf.train.Int64List(value=[i])),
            }))
            w.write(ex.SerializeToString())
    got = [int(ex.feature("idx")[0]) for ex in NativeRLDSReader([path], prefetch_depth=8)]
    assert got == list(range(500))


def test_corrupt_jpeg_raises_not_exits():
    from roboticattack_tpu.data.native_loader import decode_jpeg

    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0 garbage not a jpeg at all")
    # truncated real jpeg: valid header, cut body
    import io
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(buf, format="JPEG")
    data = buf.getvalue()[: len(buf.getvalue()) // 2]
    with pytest.raises(ValueError):
        decode_jpeg(data)


def test_native_lanczos_resize_parity():
    """The C++ decode+resize (rlds_jpeg_decode_resized) matches the tf path's
    lanczos3 antialias resize (obs_transforms.py:45-58) and PIL LANCZOS within
    uint8 quantization tolerance on smooth and random content, both down- and
    up-scaling."""
    import io

    from PIL import Image

    from roboticattack_tpu.data.native_loader import decode_jpeg, decode_jpeg_resized

    rng = np.random.default_rng(0)
    # smooth gradient + random texture, 256 -> 224 (bridge) and 96 -> 224 (up)
    yy, xx = np.mgrid[0:256, 0:256]
    smooth = np.stack([yy, xx, (yy + xx) // 2], axis=-1).astype(np.uint8)
    noisy = rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)
    small = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)

    for arr, size in ((smooth, 224), (noisy, 224), (small, 224), (noisy, 96)):
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="JPEG", quality=95)
        data = buf.getvalue()

        got = decode_jpeg_resized(data, size)
        assert got.shape == (size, size, 3) and got.dtype == np.uint8

        decoded = decode_jpeg(data)  # same libjpeg pixels as the native path
        import tensorflow as tf

        want_tf = tf.cast(tf.clip_by_value(tf.round(tf.image.resize(
            tf.constant(decoded), [size, size], method="lanczos3", antialias=True
        )), 0, 255), tf.uint8).numpy()
        diff = np.abs(got.astype(np.int16) - want_tf.astype(np.int16))
        assert np.mean(diff) < 1.0 and np.percentile(diff, 99) <= 2, (
            diff.mean(), diff.max())

        want_pil = np.asarray(
            Image.fromarray(decoded).resize((size, size), Image.LANCZOS)
        )
        diff_pil = np.abs(got.astype(np.int16) - want_pil.astype(np.int16))
        assert np.mean(diff_pil) < 1.5, diff_pil.mean()

    # same-size input short-circuits to a plain decode
    buf = io.BytesIO()
    Image.fromarray(noisy[:224, :224]).save(buf, format="JPEG")
    np.testing.assert_array_equal(
        decode_jpeg_resized(buf.getvalue(), 224), decode_jpeg(buf.getvalue())
    )


def test_corrupt_tfrecord_framing_is_nonfatal():
    """TFRecord framing corruption must be a clean per-shard stop, never a
    process abort: the reader validates the masked CRC32C of the length
    header BEFORE allocating (a flipped length byte used to raise a
    multi-petabyte std::bad_alloc and terminate()), verifies the payload CRC,
    and continues with the next shard."""
    import tempfile

    from roboticattack_tpu.data.native_loader import NativeRLDSReader
    from roboticattack_tpu.data.synthetic_shards import write_episode_tfrecord

    d = tempfile.mkdtemp()
    good = os.path.join(d, "good.tfrecord")
    write_episode_tfrecord(good, n_episodes=3, steps=4)
    data = bytearray(open(good, "rb").read())

    # valid file: our CRC32C implementation validates TF's own checksums
    assert sum(1 for _ in NativeRLDSReader([good], prefetch_depth=4)) == 3

    cases = {}
    bad_len = bytearray(data)
    bad_len[6] = 0x7F  # ~36 PB declared length
    cases["badlen"] = bytes(bad_len)
    zero = bytearray(data)
    zero[0:8] = b"\x00" * 8  # zeroed header fails the length CRC
    cases["zerolen"] = bytes(zero)
    payload = bytearray(data)
    payload[len(data) // 3] ^= 0xFF  # payload bit flip caught by payload CRC
    cases["payload"] = bytes(payload)

    for name, blob in cases.items():
        path = os.path.join(d, f"{name}.tfrecord")
        with open(path, "wb") as f:
            f.write(blob)
        assert sum(1 for _ in NativeRLDSReader([path], prefetch_depth=4)) == 0, name
        # a corrupt shard must not poison the stream: the next shard reads
        assert sum(1 for _ in NativeRLDSReader([path, good], prefetch_depth=4)) == 3

    # truncation mid-record: complete records still come through
    trunc = os.path.join(d, "trunc.tfrecord")
    with open(trunc, "wb") as f:
        f.write(bytes(data[: len(data) // 2 + 7]))
    assert sum(1 for _ in NativeRLDSReader([trunc], prefetch_depth=4)) == 1
