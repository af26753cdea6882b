"""Serving endpoint (cli/serve.py): micro-batcher semantics, request
layout parsing, and an end-to-end HTTP drive of a tiny mnist service
(one compiled executable, concurrent requests coalesced into padded
device batches)."""

from __future__ import annotations

import base64
import http.client
import io
import json
import threading

import numpy as np
import pytest

from multiple_objects_gan_tpu.cli.serve import (
    MicroBatcher,
    _item_layout,
    _png_b64,
    serve,
)

_MNIST_YML = """
DATASET_NAME: 'multi-mnist'
Z_DIM: 16
IMSIZE: 64
TRAIN:
    FLAG: False
    BATCH_SIZE: 4
GAN:
    CONDITION_DIM: 32
    DF_DIM: 8
    GF_DIM: 8
"""


def test_microbatcher_coalesces_concurrent_requests():
    sizes = []

    def run_batch(items):
        sizes.append(len(items))
        return [i * 10 for i in items]

    b = MicroBatcher(run_batch, max_batch=4, max_wait_ms=60)
    results = [None] * 6

    def call(i):
        results[i] = b.submit(i)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    b.close()

    assert results == [0, 10, 20, 30, 40, 50]  # fan-out order preserved
    assert sum(sizes) == 6
    assert max(sizes) > 1          # concurrency actually coalesced
    assert all(s <= 4 for s in sizes)
    snap = b.snapshot()
    assert snap["requests"] == 6 and snap["items"] == 6
    assert snap["avg_batch_fill"] > 1.0


def test_microbatcher_fans_out_errors():
    def run_batch(items):
        raise RuntimeError("boom")

    b = MicroBatcher(run_batch, max_batch=2, max_wait_ms=1)
    with pytest.raises(RuntimeError, match="boom"):
        b.submit({"x": 1})
    b.close()


def test_item_layout_ids_and_onehots():
    rs = np.random.RandomState(0)
    lab, bb = _item_layout({"labels": [3, [0] * 9 + [1]],
                            "bboxes": [[0.1, 0.2, 0.3, 0.4],
                                       [0.5, 0.5, 0.2, 0.2]]}, 3, 10, rs)
    assert lab.shape == (3, 10) and bb.shape == (3, 4)
    assert lab[0, 3] == 1.0 and lab[1, 9] == 1.0
    np.testing.assert_allclose(bb[0], [0.1, 0.2, 0.3, 0.4])
    np.testing.assert_allclose(bb[2], -1.0)   # padded object
    assert lab[2].sum() == 0.0


def test_item_layout_random_fallback_and_errors():
    rs = np.random.RandomState(0)
    lab, bb = _item_layout({}, 3, 10, rs)      # no layout -> random
    n_active = int((bb[:, 0] >= 0).sum())
    assert 1 <= n_active <= 3
    assert lab.sum() == n_active               # one-hot per active object

    with pytest.raises(ValueError, match="same length"):
        _item_layout({"labels": [1], "bboxes": []}, 3, 10, rs)
    with pytest.raises(ValueError, match="at most"):
        _item_layout({"labels": [1] * 4,
                      "bboxes": [[0, 0, .1, .1]] * 4}, 3, 10, rs)
    with pytest.raises(ValueError, match="one-hot"):
        _item_layout({"labels": [[1, 0]],
                      "bboxes": [[0, 0, .1, .1]]}, 3, 10, rs)


def test_png_b64_roundtrip():
    from PIL import Image

    img = np.zeros((8, 8, 3), np.float32)
    img[2, 3] = 1.0    # -> 255
    img[4, 5] = -1.0   # -> 0
    raw = base64.b64decode(_png_b64(img))
    arr = np.asarray(Image.open(io.BytesIO(raw)))
    assert arr.shape == (8, 8, 3)
    assert tuple(arr[2, 3]) == (255, 255, 255)
    assert tuple(arr[4, 5]) == (0, 0, 0)
    # grayscale input -> single-channel PNG
    arr1 = np.asarray(Image.open(io.BytesIO(base64.b64decode(
        _png_b64(np.zeros((8, 8, 1), np.float32))))))
    assert arr1.shape == (8, 8)


@pytest.fixture(scope="module")
def mnist_server(tmp_path_factory):
    import argparse

    from multiple_objects_gan_tpu.config.config import cfg_from_file

    yml = tmp_path_factory.mktemp("serve") / "mnist.yml"
    yml.write_text(_MNIST_YML)
    cfg = cfg_from_file(str(yml), "multi-mnist")
    args = argparse.Namespace(variant="multi-mnist", host="127.0.0.1",
                              port=0, max_batch=4, max_wait_ms=20.0,
                              seed=0, data_dir="", img_dir="", net_g="")
    httpd = serve(args, cfg)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield httpd.server_address[1], httpd
    httpd.shutdown()
    httpd.batcher.close()


def _post(port, path, obj, timeout=120):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    conn.request("POST", path, body=json.dumps(obj),
                 headers={"Content-Type": "application/json"})
    r = conn.getresponse()
    out = (r.status, json.loads(r.read()))
    conn.close()
    return out


def _get(port, path):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", path)
    r = conn.getresponse()
    out = (r.status, json.loads(r.read()))
    conn.close()
    return out


def test_serve_http_end_to_end(mnist_server):
    from PIL import Image

    port, httpd = mnist_server

    status, health = _get(port, "/healthz")
    assert status == 200 and health["ok"] and \
        health["variant"] == "multi-mnist"

    # two items in one request: explicit layout + random layout
    status, resp = _post(port, "/generate", {"items": [
        {"labels": [3, 7], "bboxes": [[0.1, 0.1, 0.3, 0.3],
                                      [0.5, 0.5, 0.3, 0.3]]},
        {},
    ]})
    assert status == 200
    assert len(resp["images"]) == 2
    for b64 in resp["images"]:
        arr = np.asarray(Image.open(io.BytesIO(base64.b64decode(b64))))
        assert arr.shape == (64, 64)      # mnist: 1-channel 64px
        assert arr.dtype == np.uint8

    # concurrent single-item posts coalesce in the batcher
    results = []

    def one():
        results.append(_post(port, "/generate", {"items": [{}]}))

    threads = [threading.Thread(target=one) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(s == 200 and len(r["images"]) == 1 for s, r in results)

    status, stats = _get(port, "/stats")
    assert status == 200
    assert stats["requests"] >= 6       # 2 + 4 (+ warmup not counted)
    assert stats["max_batch"] == 4

    # request-level validation errors -> 400
    status, err = _post(port, "/generate", {"items": []})
    assert status == 400 and "non-empty" in err["error"]
    status, err = _post(port, "/generate", {"items": [{}] * 5})
    assert status == 400 and "at most" in err["error"]
    status, err = _post(port, "/generate", {"items": [
        {"labels": [1], "bboxes": []}]})
    assert status == 400 and "same length" in err["error"]


_S2_YML = """
DATASET_NAME: 'coco'
Z_DIM: 16
IMSIZE: 256
STAGE: 2
TRAIN:
    FLAG: False
    BATCH_SIZE: 2
GAN:
    CONDITION_DIM: 16
    DF_DIM: 8
    GF_DIM: 8
    R_NUM: 1
TEXT:
    DIMENSION: 32
"""


@pytest.fixture(scope="module")
def s2_server(tmp_path_factory):
    import argparse

    from multiple_objects_gan_tpu.config.config import cfg_from_file

    yml = tmp_path_factory.mktemp("serve_s2") / "s2.yml"
    yml.write_text(_S2_YML)
    cfg = cfg_from_file(str(yml), "coco-stackgan")
    args = argparse.Namespace(variant="coco-stackgan-2", host="127.0.0.1",
                              port=0, max_batch=2, max_wait_ms=20.0,
                              seed=0, data_dir="", img_dir="", net_g="")
    httpd = serve(args, cfg)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield httpd.server_address[1], httpd
    httpd.shutdown()
    httpd.batcher.close()


def test_serve_stackgan2_256px(s2_server):
    """The headline 256px output served end-to-end: frozen S1 + refiner
    in one executable, dual-scale bboxes (VERDICT r4 missing #3).
    Composition ref: code/coco/stackgan/trainer.py:281-419."""
    from PIL import Image

    port, _ = s2_server

    status, health = _get(port, "/healthz")
    assert status == 200 and health["variant"] == "coco-stackgan-2"

    emb = [0.1] * 32
    status, resp = _post(port, "/generate", {"items": [
        {"labels": [3], "bboxes": [[0.1, 0.1, 0.4, 0.4]],
         "text_embedding": emb},
        {"labels": [5], "bboxes": [[0.2, 0.2, 0.3, 0.3]],
         "bboxes_s2": [[0.25, 0.25, 0.3, 0.3]],
         "text_embedding": emb},
    ]})
    assert status == 200 and len(resp["images"]) == 2
    for b64 in resp["images"]:
        arr = np.asarray(Image.open(io.BytesIO(base64.b64decode(b64))))
        assert arr.shape == (256, 256, 3)   # 256px RGB — stage-2's output
        assert arr.dtype == np.uint8

    # schema errors -> 400
    status, err = _post(port, "/generate", {"items": [
        {"labels": [1], "bboxes": [[0.1, 0.1, 0.2, 0.2]]}]})
    assert status == 400 and "text_embedding" in err["error"]
    status, err = _post(port, "/generate", {"items": [
        {"labels": [1, 2], "bboxes": [[0.1, 0.1, 0.2, 0.2]] * 2,
         "bboxes_s2": [[0.1, 0.1, 0.2, 0.2]],
         "text_embedding": emb}]})
    assert status == 400 and "bboxes_s2" in err["error"]
