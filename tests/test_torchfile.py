"""Pure-Python Torch7 (.t7) reader/writer round-trip + the val_captions
contract the reference eval depends on (code/coco/stackgan/trainer.py:
300-302: t_file.raw_txt caption strings, t_file.fea_txt embedding
tensors)."""

import numpy as np

from multiple_objects_gan_tpu.io.torchfile import (
    load, load_val_captions, save)


def test_roundtrip_scalars_tables(tmp_path):
    path = str(tmp_path / "x.t7")
    obj = {
        "a": 1.5,
        "flag": True,
        "none": None,
        "name": "hello",
        "nested": {"k": [1.0, 2.0, 3.0]},
    }
    save(path, obj)
    out = load(path)
    assert out[b"a"] == 1.5
    assert out[b"flag"] is True
    assert out[b"none"] is None
    assert out[b"name"] == b"hello"
    assert out[b"nested"][b"k"] == [1.0, 2.0, 3.0]


def test_roundtrip_tensors(tmp_path):
    path = str(tmp_path / "t.t7")
    f = np.arange(12, dtype=np.float32).reshape(3, 4)
    d = np.random.RandomState(0).randn(2, 2, 2)
    save(path, {"f": f, "d": d})
    out = load(path)
    np.testing.assert_array_equal(out[b"f"], f)
    assert out[b"f"].dtype == np.float32
    np.testing.assert_array_equal(out[b"d"], d)
    assert out[b"d"].dtype == np.float64


def test_lua_list_detection(tmp_path):
    path = str(tmp_path / "l.t7")
    save(path, ["a", "b", "c"])
    assert load(path) == [b"a", b"b", b"c"]


def test_strided_tensor_read(tmp_path):
    """A transposed (non-contiguous-in-lua-order) tensor reads correctly:
    the reader honors explicit strides + storage offset."""
    import struct

    path = str(tmp_path / "s.t7")
    data = np.arange(10, dtype=np.float32)
    with open(path, "wb") as fh:
        # hand-rolled FloatTensor: shape (2,2), strides (1,2) [elements],
        # offset 2 (1-based) -> [[1, 3], [2, 4]]
        fh.write(struct.pack("<i", 4))          # TYPE_TORCH
        fh.write(struct.pack("<i", 1))          # ref index
        for s in (b"V 1", b"torch.FloatTensor"):
            fh.write(struct.pack("<i", len(s)) + s)
        fh.write(struct.pack("<i", 2))          # ndim
        fh.write(struct.pack("<qq", 2, 2))      # sizes
        fh.write(struct.pack("<qq", 1, 2))      # strides
        fh.write(struct.pack("<q", 2))          # offset (1-based)
        fh.write(struct.pack("<i", 4))          # TYPE_TORCH (storage)
        fh.write(struct.pack("<i", 2))
        for s in (b"V 1", b"torch.FloatStorage"):
            fh.write(struct.pack("<i", len(s)) + s)
        fh.write(struct.pack("<q", data.size))
        fh.write(data.tobytes())
    out = load(path)
    np.testing.assert_array_equal(out, [[1.0, 3.0], [2.0, 4.0]])


def test_val_captions_contract(tmp_path):
    path = str(tmp_path / "val_captions.t7")
    rng = np.random.RandomState(3)
    embs = [rng.randn(1, 16).astype(np.float32) for _ in range(4)]
    save(path, {"raw_txt": [f"caption {i}" for i in range(4)],
                "fea_txt": embs})
    captions, embeddings = load_val_captions(path)
    assert captions == [f"caption {i}" for i in range(4)]
    assert embeddings.shape == (4, 16)
    np.testing.assert_allclose(embeddings,
                               np.concatenate(embs, axis=0))


def test_synthetic_coco_writes_t7(tmp_path):
    from multiple_objects_gan_tpu.data.coco import write_synthetic_coco

    data, imgs = str(tmp_path / "d"), str(tmp_path / "i")
    write_synthetic_coco(data, imgs, n=4, split="test", seed=0)
    captions, embeddings = load_val_captions(
        str(tmp_path / "d" / "test" / "val_captions.t7"))
    assert len(captions) == 4 and embeddings.shape[0] == 4
