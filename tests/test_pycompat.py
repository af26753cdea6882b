"""Python-2 artifact compatibility (io/pycompat.py).

The published datasets are Python-2 cPickle files (reference:
code/multi-mnist/miscc/utils.py:4 cPickle; loaded at
code/coco/stackgan/miscc/datasets.py:81-92,
code/coco/attngan/datasets.py:261-291) and the .pth checkpoints were
written by py2 torch-0.4.  These tests build GENUINE py2-protocol
fixtures — SHORT_BINSTRING/BINSTRING opcodes and the py2 numpy
``_reconstruct`` reduce, byte-constructed below exactly as py2 cPickle
protocol 2 emits them — and assert every loader reads them.
"""

import os
import pickle
import struct
import zipfile

import numpy as np
import pytest

from multiple_objects_gan_tpu.io.pycompat import load_pickle, torch_load

# ---------------------------------------------------------------- py2 pickler


def _binstring(b: bytes) -> bytes:
    """py2 str -> SHORT_BINSTRING / BINSTRING opcode."""
    if len(b) < 256:
        return b"U" + bytes([len(b)]) + b
    return b"T" + struct.pack("<I", len(b)) + b


def _py2_dtype(descr: str) -> bytes:
    """numpy.dtype reduce exactly as py2 cPickle protocol 2 emits it:
    dtype(kind, 0, 1) then __setstate__((3, byteorder, ...))."""
    kind, order = descr[1:].encode(), descr[0].encode()
    return (b"cnumpy\ndtype\n(" + _binstring(kind) + b"K\x00K\x01tR(" +
            b"K\x03" + _binstring(order) +
            b"NNNJ\xff\xff\xff\xffJ\xff\xff\xff\xffK\x00tb")


def _py2_pickle_obj(obj) -> bytes:
    """Pickle one value with py2 opcodes: ndarray via _reconstruct with a
    BINSTRING raw buffer; bytes as py2 str; lists/tuples/dicts/ints/None
    recursively."""
    if isinstance(obj, np.ndarray):
        a = np.ascontiguousarray(obj)
        out = bytearray()
        out += b"cnumpy.core.multiarray\n_reconstruct\ncnumpy\nndarray\n"
        out += b"K\x00\x85" + _binstring(b"b") + b"\x87R("
        out += b"K\x01("
        for d in a.shape:
            out += b"J" + struct.pack("<i", d)
        out += b"t" + _py2_dtype(a.dtype.str)
        out += b"\x89"  # C order
        out += _binstring(a.tobytes())
        out += b"tb"
        return bytes(out)
    if isinstance(obj, bytes):  # a py2 str
        return _binstring(obj)
    if isinstance(obj, bool):
        return b"\x88" if obj else b"\x89"
    if isinstance(obj, int):
        return b"J" + struct.pack("<i", obj)
    if isinstance(obj, float):
        return b"G" + struct.pack(">d", obj)
    if obj is None:
        return b"N"
    if isinstance(obj, list):
        return (b"](" + b"".join(_py2_pickle_obj(x) for x in obj) + b"e")
    if isinstance(obj, tuple):
        return (b"(" + b"".join(_py2_pickle_obj(x) for x in obj) + b"t")
    if isinstance(obj, dict):
        return (b"}(" + b"".join(_py2_pickle_obj(k) + _py2_pickle_obj(v)
                                 for k, v in obj.items()) + b"u")
    raise TypeError(type(obj))


def py2_pickle(obj) -> bytes:
    """Full protocol-2 stream as py2 cPickle would write it."""
    return b"\x80\x02" + _py2_pickle_obj(obj) + b"."


def write_py2_pickle(path: str, obj) -> None:
    with open(path, "wb") as f:
        f.write(py2_pickle(obj))


# --------------------------------------------------------------- unit tests


def test_py2_numpy_array_roundtrip(tmp_path):
    # float buffers contain non-ascii bytes -> bare pickle.load raises
    arr = np.array([[0.1, -2.5, 3.25], [1e-3, 7.0, -0.0]], np.float32)
    p = tmp_path / "bboxes.pickle"
    write_py2_pickle(str(p), arr)
    with open(p, "rb") as f:
        with pytest.raises(UnicodeDecodeError):
            pickle.load(f)
    got = load_pickle(str(p))
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, arr)


def test_py2_numpy_float64_and_int64(tmp_path):
    for arr in (np.linspace(-3, 3, 17).reshape(1, 17),
                np.arange(-4, 8, dtype=np.int64).reshape(3, 4)):
        p = tmp_path / "a.pickle"
        write_py2_pickle(str(p), arr)
        got = load_pickle(str(p))
        assert got.dtype == arr.dtype
        np.testing.assert_array_equal(got, arr)


def test_py2_latin1_filenames(tmp_path):
    # latin1-encoded py2 strs (0xe9 = e-acute) -> latin1 fallback
    p = tmp_path / "filenames.pickle"
    write_py2_pickle(str(p), [b"caf\xe9_0001.png", b"img_0002.png"])
    assert load_pickle(str(p)) == ["caf\xe9_0001.png", "img_0002.png"]


def test_py2_utf8_captions_decode_correctly(tmp_path):
    # utf-8-encoded py2 text (the captions vocab case) must decode via
    # the utf-8 stage — NOT mojibake through latin1
    p = tmp_path / "captions.pickle"
    wordtoix = {b"a": 1, b"caf\xc3\xa9": 2}
    ixtoword = {1: b"a", 2: b"caf\xc3\xa9"}
    caps = [[[1, 2], [2, 1, 1]], [[2]]]
    write_py2_pickle(str(p), [caps[0], caps[1], ixtoword, wordtoix])
    tr, te, ix2w, w2ix = load_pickle(str(p))
    assert tr == caps[0] and te == caps[1]
    assert w2ix == {"a": 1, "caf\xe9": 2}  # utf-8 decoded, single char
    assert ix2w[2] == "caf\xe9"


def test_py3_pickle_passthrough(tmp_path):
    obj = {"names": ["x.png"], "arr": np.arange(5, dtype=np.float32)}
    p = tmp_path / "p3.pickle"
    with open(p, "wb") as f:
        pickle.dump(obj, f)
    got = load_pickle(str(p))
    assert got["names"] == obj["names"]
    np.testing.assert_array_equal(got["arr"], obj["arr"])


def test_py2_ascii_only_buffer(tmp_path):
    # an all-zero buffer IS ascii-decodable: the first attempt succeeds
    # and must still reconstruct byte-exactly
    arr = np.zeros((4, 4), np.float32)
    p = tmp_path / "z.pickle"
    write_py2_pickle(str(p), arr)
    np.testing.assert_array_equal(load_pickle(str(p)), arr)


def test_py2_buffer_that_is_valid_utf8_multibyte(tmp_path):
    # a buffer that decodes as valid multi-byte utf-8 shrinks when numpy
    # re-encodes latin1 -> the utf-8 attempt fails with ValueError deep in
    # __setstate__ and MUST still fall through to latin1
    raw = b"\xc3\xa9" * 8  # valid utf-8, 16 bytes -> 8 chars
    arr = np.frombuffer(raw, np.uint8).reshape(4, 4).copy()
    p = tmp_path / "u.pickle"
    write_py2_pickle(str(p), arr)
    got = load_pickle(str(p))
    np.testing.assert_array_equal(got, arr)


# -------------------------------------------------------- loader integration


def test_multimnist_dataset_reads_py2_pickles(tmp_path):
    from multiple_objects_gan_tpu.data.datasets import (
        MultiMnistDataset, write_synthetic_multimnist)

    write_synthetic_multimnist(str(tmp_path), n=6, split="test", seed=0)
    split = tmp_path / "test" / "normal"
    # rewrite all three pickles as py2 cPickle
    names = load_pickle(str(split / "filenames.pickle"))
    write_py2_pickle(str(split / "filenames.pickle"),
                     [n.encode() for n in names])
    for f in ("bboxes.pickle", "labels.pickle"):
        write_py2_pickle(str(split / f),
                         np.asarray(load_pickle(str(split / f)), np.float32))
    ds = MultiMnistDataset(str(tmp_path), split="test", cache=False)
    item = ds[0]
    assert item["image"].shape == (64, 64, 1)
    assert item["bbox"].shape == (3, 4)
    assert item["label_onehot"].shape == (3, 10)


def test_coco_dataset_reads_py2_pickles(tmp_path):
    from multiple_objects_gan_tpu.data.coco import (
        CocoStackganDataset, write_synthetic_coco)

    data_dir, img_dir = str(tmp_path / "d"), str(tmp_path / "imgs")
    write_synthetic_coco(data_dir, img_dir, n=4, split="train", seed=0)
    split = os.path.join(data_dir, "train")
    names = load_pickle(os.path.join(split, "filenames.pickle"))
    write_py2_pickle(os.path.join(split, "filenames.pickle"),
                     [n.encode() for n in names])
    for f, dt in (("bboxes.pickle", np.float32), ("labels.pickle", np.int64),
                  ("char-CNN-RNN-embeddings.pickle", np.float32)):
        write_py2_pickle(os.path.join(split, f),
                         np.asarray(load_pickle(os.path.join(split, f)), dt))
    ds = CocoStackganDataset(data_dir, img_dir, split="train", stage=1,
                             imsize=64)
    item = ds[0]
    assert item["image"].shape == (64, 64, 3)
    assert item["text_embedding"].shape[-1] == 1024


def test_attngan_dataset_reads_py2_captions(tmp_path):
    from multiple_objects_gan_tpu.data.attngan import (
        AttnGanDataset, write_synthetic_attngan)

    data_dir, img_dir = str(tmp_path / "d"), str(tmp_path / "imgs")
    write_synthetic_attngan(data_dir, img_dir, n=6, seed=0)
    # build the captions cache once (py3), then rewrite it as py2 cPickle
    # — vocab-index parity with the published DAMSM NET_E depends on
    # reading the PUBLISHED captions.pickle, which is py2
    ds = AttnGanDataset(data_dir, img_dir, split="train", branch_num=2,
                        base_size=64)
    cache = os.path.join(data_dir, "captions.pickle")
    tr, te, ixtoword, wordtoix = load_pickle(cache)
    write_py2_pickle(cache, [tr, te,
                             {k: v.encode() for k, v in ixtoword.items()},
                             {k.encode(): v for k, v in wordtoix.items()}])
    for split in ("train", "test"):
        sd = os.path.join(data_dir, split)
        write_py2_pickle(
            os.path.join(sd, "bboxes.pickle"),
            np.asarray(load_pickle(os.path.join(sd, "bboxes.pickle")),
                       np.float32))
        write_py2_pickle(
            os.path.join(sd, "labels.pickle"),
            np.asarray(load_pickle(os.path.join(sd, "labels.pickle")),
                       np.int64))
        names = load_pickle(os.path.join(sd, "filenames.pickle"))
        write_py2_pickle(os.path.join(sd, "filenames.pickle"),
                         [n.encode() for n in names])
    ds2 = AttnGanDataset(data_dir, img_dir, split="train", branch_num=2,
                         base_size=64)
    assert ds2.wordtoix == ds.wordtoix
    assert ds2.ixtoword == ds.ixtoword
    assert ds2.n_words == ds.n_words
    item = ds2[0]
    assert item["captions"].shape == ds[0]["captions"].shape
    assert item["image64"].shape == (64, 64, 3)


# ----------------------------------------------------------------- torch.load


def test_torch_load_py2_str_fallback(tmp_path):
    """A .pth whose pickle payload holds a py2 SHORT_BINSTRING with a
    non-ascii byte (as py2 torch-0.4 containers can) must load via the
    latin1 fallback."""
    import torch

    sd = {"epoch": 7, "path": "markerXYZ",
          "w": torch.arange(6, dtype=torch.float32).reshape(2, 3)}
    raw = tmp_path / "ck.pth"
    torch.save(sd, str(raw))
    # rewrite data.pkl inside the zip: BINUNICODE 'markerXYZ' ->
    # SHORT_BINSTRING 'marker\xe9YZ' (a py2 str opcode)
    with zipfile.ZipFile(str(raw)) as z:
        entries = {n: z.read(n) for n in z.namelist()}
    pkl_name = [n for n in entries if n.endswith("data.pkl")][0]
    needle = b"X\t\x00\x00\x00markerXYZ"
    assert needle in entries[pkl_name]
    entries[pkl_name] = entries[pkl_name].replace(
        needle, b"U\tmarker\xe9YZ")
    patched = tmp_path / "ck_py2.pth"
    with zipfile.ZipFile(str(patched), "w", zipfile.ZIP_STORED) as z:
        for n, b in entries.items():
            z.writestr(n, b)
    with pytest.raises(UnicodeDecodeError):
        torch.load(str(patched), map_location="cpu", weights_only=False)
    got = torch_load(str(patched))
    assert got["epoch"] == 7
    assert got["path"] == "marker\xe9YZ"
    assert float(got["w"].sum()) == 15.0


def test_torch_load_py3_passthrough(tmp_path):
    import torch

    p = tmp_path / "ok.pth"
    torch.save({"a": torch.ones(3)}, str(p))
    assert float(torch_load(str(p))["a"].sum()) == 3.0


# ------------------------------------------------------------ entry-point ban


def test_no_bare_pickle_or_torch_load_in_package():
    """pycompat must be the ONLY pickle/torch.load entry point: any new
    bare call would silently reintroduce the py2 incompatibility."""
    import multiple_objects_gan_tpu as pkg

    root = os.path.dirname(pkg.__file__)
    offenders = []
    for dirpath, _, files in os.walk(root):
        for fn in files:
            if not fn.endswith(".py") or fn == "pycompat.py":
                continue
            path = os.path.join(dirpath, fn)
            with open(path) as f:
                for i, line in enumerate(f, 1):
                    if "pickle.load(" in line or "torch.load(" in line:
                        offenders.append(f"{path}:{i}: {line.strip()}")
    assert not offenders, "\n".join(offenders)
