"""Production serving endpoint: layout/caption -> image over HTTP.

The reference has no serving story (its eval paths write PNG files from
a Python loop, code/multi-mnist/trainer.py:208-342); this module adds
the deployment-shaped counterpart for TPU:

- ONE jitted generation executable at a fixed ``max_batch`` (static
  shapes — XLA compiles once, every request reuses it),
- a micro-batcher that coalesces concurrent HTTP requests into padded
  device batches (TPU serving throughput comes from batch occupancy:
  tools/bench_sampling.py measures ~45k img/s at bs 128 vs ~300 img/s
  at bs 1 for mnist — the batcher is what closes that gap under
  concurrent load),
- weights live on device once and enter the jit as ARGUMENTS (the
  tunneled remote-compile endpoint rejects big constant-folded
  requests — see CLAUDE.md).

Supported variants:
- ``multi-mnist`` / ``clevr``: request items carry ``labels`` (class
  ids) + ``bboxes`` ([x, y, w, h] normalized), optional ``seed``.
- ``coco-stackgan-1``: additionally ``text_embedding`` (the 1024-d
  char-CNN-RNN caption embedding; the reference ships these
  precomputed — there is no in-repo encoder for free text).
- ``coco-stackgan-2``: same schema at 256px (the paper's headline
  output) — frozen stage-1 G + refiner in ONE jit, optional
  ``bboxes_s2`` for a distinct output-scale layout.
- ``coco-attngan``: ``caption`` free text (tokenized with the dataset
  vocab like gen_example, cli/attngan_runner.py) + optional
  ``labels``/``bboxes`` (random layout otherwise).

HTTP API (stdlib http.server, threaded):
  POST /generate  {"items": [{...}, ...]}            -> {"images": [b64 png]}
  GET  /healthz                                      -> {"ok": true, ...}
  GET  /stats                                        -> batcher counters

Usage:
  python -m multiple_objects_gan_tpu.cli.serve --variant multi-mnist \
      --cfg cfg/mnist_eval.yml --net_g OUTPUT_DIR_OR_PTH \
      [--data_dir D] [--port 8000] [--max_batch 64] [--max_wait_ms 5]
      [--bf16]
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable, Optional

import numpy as np


# ---------------------------------------------------------------------------
# micro-batcher


class _Pending:
    __slots__ = ("item", "event", "result", "error")

    def __init__(self, item):
        self.item = item
        self.event = threading.Event()
        self.result = None
        self.error: Optional[Exception] = None


class MicroBatcher:
    """Coalesce concurrent single-item requests into device batches.

    ``run_batch(items) -> results`` is called on a dedicated worker
    thread with 1..max_batch items: the first queued item starts a
    batch, which then waits up to ``max_wait_ms`` for more before
    launching. Results (or the exception) fan back to the callers.
    """

    def __init__(self, run_batch: Callable[[list], list], max_batch: int,
                 max_wait_ms: float = 5.0):
        self._run_batch = run_batch
        self.max_batch = int(max_batch)
        self.max_wait = float(max_wait_ms) / 1e3
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self.stats = {"requests": 0, "batches": 0, "items": 0,
                      "batch_ms_total": 0.0}
        self._lock = threading.Lock()
        self._stop = False
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def submit(self, item) -> Any:
        """Block until the batch containing ``item`` completes."""
        return self.submit_many([item])[0]

    def submit_many(self, items: list) -> list:
        """Enqueue all items at once (so one request's items share device
        batches) and block until every result is in."""
        pending = [_Pending(it) for it in items]
        with self._lock:
            self.stats["requests"] += len(pending)
        for p in pending:
            self._q.put(p)
        for p in pending:
            p.event.wait()
        for p in pending:
            if p.error is not None:
                raise p.error
        return [p.result for p in pending]

    def close(self):
        self._stop = True
        self._q.put(None)  # wake the worker
        self._thread.join(timeout=5)

    def _collect(self) -> list:
        first = self._q.get()
        if first is None:
            return []
        batch = [first]
        deadline = time.monotonic() + self.max_wait
        while len(batch) < self.max_batch:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                nxt = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if nxt is None:
                break
            batch.append(nxt)
        return batch

    def _worker(self):
        while not self._stop:
            batch = self._collect()
            if not batch:
                continue
            t0 = time.monotonic()
            try:
                results = self._run_batch([p.item for p in batch])
                for p, r in zip(batch, results):
                    p.result = r
            except Exception as e:  # fan the failure out to all callers
                for p in batch:
                    p.error = e
            dt = (time.monotonic() - t0) * 1e3
            with self._lock:
                self.stats["batches"] += 1
                self.stats["items"] += len(batch)
                self.stats["batch_ms_total"] += dt
            for p in batch:
                p.event.set()

    def snapshot(self) -> dict:
        with self._lock:
            s = dict(self.stats)
        b = max(s["batches"], 1)
        s["avg_batch_fill"] = round(s["items"] / b, 2)
        s["avg_batch_ms"] = round(s["batch_ms_total"] / b, 2)
        s.pop("batch_ms_total")
        s["max_batch"] = self.max_batch
        return s


# ---------------------------------------------------------------------------
# model services (one compiled executable each, padded to max_batch)


def _png_b64(img: np.ndarray) -> str:
    """[-1, 1] float image -> base64 PNG."""
    from PIL import Image

    u8 = np.clip((np.asarray(img, np.float32) + 1.0) * 127.5,
                 0, 255).astype(np.uint8)
    if u8.shape[-1] == 1:
        u8 = u8[..., 0]
    buf = io.BytesIO()
    Image.fromarray(u8).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def _item_layout(item: dict, max_objects: int, label_dim: int,
                 rs: np.random.RandomState):
    """(labels one-hot (O, L), bbox (O, 4)) from a request item; missing
    layout -> random (same scheme as tools/validate_learning.py); missing
    objects padded with bbox=-1 like the reference datasets."""
    labels = np.zeros((max_objects, label_dim), np.float32)
    bbox = np.full((max_objects, 4), -1.0, np.float32)
    ids = item.get("labels")
    boxes = item.get("bboxes")
    if ids is None and boxes is None:
        n = rs.randint(1, max_objects + 1)
        ids = rs.randint(0, label_dim, n).tolist()
        w = rs.uniform(0.2, 0.4, n)
        h = rs.uniform(0.2, 0.4, n)
        boxes = np.stack([rs.uniform(0, 1 - w), rs.uniform(0, 1 - h), w, h],
                         axis=-1).tolist()
    ids = list(ids or [])
    boxes = list(boxes or [])
    if len(ids) != len(boxes):
        raise ValueError("labels and bboxes must have the same length")
    if len(ids) > max_objects:
        raise ValueError(f"at most {max_objects} objects supported")
    for o, (lab, bb) in enumerate(zip(ids, boxes)):
        row = np.asarray(lab, np.float32).reshape(-1)
        if row.size == 1:  # class id -> one-hot
            labels[o, int(row[0])] = 1.0
        elif row.size == label_dim:
            labels[o] = row
        else:
            raise ValueError(f"label must be an id or a {label_dim}-d "
                             "one-hot")
        bbox[o] = np.asarray(bb, np.float32)
    return labels, bbox


class Stage1Service:
    """multi-mnist / clevr / coco-stackgan-1 generation at max_batch."""

    def __init__(self, cfg, variant: str, max_batch: int, seed: int):
        import jax

        from multiple_objects_gan_tpu.config.config import (
            stage1_model_config)
        from multiple_objects_gan_tpu.models.stage1 import Stage1D, Stage1G
        from multiple_objects_gan_tpu.train.step import (
            create_state, make_sample_fn)

        self.variant = variant
        cfg_variant = "coco-stackgan" if variant.startswith("coco") else variant
        self.mcfg = stage1_model_config(cfg, cfg_variant)
        self.g = Stage1G(self.mcfg)
        self.max_batch = max_batch
        rng = jax.random.PRNGKey(seed)
        state = create_state(self.mcfg, self.g, Stage1D(self.mcfg), rng,
                             batch_size=2)
        self.state = _restore_stage1(cfg, self.mcfg, state)
        self._sample = make_sample_fn(self.mcfg, self.g)
        self._rs = np.random.RandomState(seed)
        self._rng = rng
        self._n = 0
        # warm the executable so the first request doesn't pay the compile
        # (stackgan needs a text embedding on every item — dummy zeros)
        warm = ({"text_embedding": [0.0] * self.mcfg.text_dim}
                if self.mcfg.text_dim else {})
        self.run([warm])

    def validate(self, item: dict) -> None:
        """Raise ValueError for a malformed request item. Runs in the HTTP
        thread BEFORE the micro-batcher, so one client's bad item cannot
        fail the other requests coalesced into the same device batch."""
        mc = self.mcfg
        _item_layout(item, mc.num_objects, mc.label_dim,
                     np.random.RandomState(0))
        if mc.text_dim:
            emb = item.get("text_embedding")
            if emb is None:
                raise ValueError(f"{self.variant} items need a "
                                 f"{mc.text_dim}-d text_embedding")
            if np.asarray(emb, np.float32).reshape(-1).size != mc.text_dim:
                raise ValueError(
                    f"text_embedding must have {mc.text_dim} values")

    def run(self, items: list) -> list:
        import jax
        import jax.numpy as jnp

        mc = self.mcfg
        B = self.max_batch
        labels = np.zeros((B, mc.num_objects, mc.label_dim), np.float32)
        bbox = np.full((B, mc.num_objects, 4), -1.0, np.float32)
        text = (np.zeros((B, mc.text_dim), np.float32)
                if mc.text_dim else None)
        for i, item in enumerate(items):
            labels[i], bbox[i] = _item_layout(item, mc.num_objects,
                                              mc.label_dim, self._rs)
            if text is not None:
                emb = item.get("text_embedding")
                if emb is None:
                    raise ValueError("coco-stackgan-1 items need a "
                                     f"{mc.text_dim}-d text_embedding")
                text[i] = np.asarray(emb, np.float32)
        self._n += 1
        z = jax.random.normal(jax.random.fold_in(self._rng, self._n),
                              (B, mc.z_dim))
        imgs = np.asarray(self._sample(
            self.state.g_params, self.state.g_stats, z,
            jnp.asarray(bbox), jnp.asarray(labels),
            jnp.asarray(text) if text is not None else None))
        return [_png_b64(imgs[i]) for i in range(len(items))]


class Stage2Service:
    """coco-stackgan-2: 256px serving — the paper's headline output.

    Wraps the reference eval composition (code/coco/stackgan/
    trainer.py:281-419): a FROZEN stage-1 G runs inside the same jit as
    the stage-2 refiner, with dual-scale bboxes (the 64px layout drives
    S1 + S2's downsampled object pathway, the 256px layout drives S2's
    output-scale pathway; requests may override ``bboxes_s2``
    separately, else it mirrors ``bboxes`` like the datasets do,
    data/coco.py). Weight sources follow sample_stage2
    (cli/stage2_runner.py): NET_G = reference .pth (incl. the wrapped
    STAGE1_G) or an orbax training dir, with STAGE1_G as the separate
    stage-1 fallback."""

    def __init__(self, cfg, max_batch: int, seed: int):
        import dataclasses

        import jax
        import jax.numpy as jnp

        from multiple_objects_gan_tpu.config.config import (
            stage1_model_config)
        from multiple_objects_gan_tpu.io.checkpoint import CheckpointManager
        from multiple_objects_gan_tpu.io.torch_import import (
            import_stage2_g, load_torch_checkpoint, maybe_load_reference_g)
        from multiple_objects_gan_tpu.models.stage1 import Stage1D, Stage1G
        from multiple_objects_gan_tpu.models.stage2 import (
            COCO_S2, Stage2D, Stage2G)
        from multiple_objects_gan_tpu.train.step import (
            create_state, create_state_stage2)

        self.variant = "coco-stackgan-2"
        s1_cfg = stage1_model_config(cfg, "coco-stackgan")
        s2_cfg = dataclasses.replace(
            COCO_S2, gf_dim=int(cfg.GAN.GF_DIM), df_dim=int(cfg.GAN.DF_DIM),
            condition_dim=int(cfg.GAN.CONDITION_DIM),
            d_cond_dim=int(cfg.GAN.CONDITION_DIM),
            text_dim=int(cfg.TEXT.DIMENSION))
        r_num = int(cfg.GAN.R_NUM)
        self.mcfg = s1_cfg  # request schema (objects/labels/text) = stage-1's
        g1 = Stage1G(s1_cfg)
        g2 = Stage2G(s2_cfg, r_num=r_num)

        rng = jax.random.PRNGKey(seed)
        s1_state = create_state(s1_cfg, g1, Stage1D(s1_cfg), rng,
                                batch_size=2)
        loaded = maybe_load_reference_g(cfg.get("STAGE1_G", ""), s1_cfg,
                                        s1_state)
        if loaded is not None:
            s1_state = loaded
        s1_vars = {"params": s1_state.g_params,
                   "batch_stats": s1_state.g_stats}

        state = create_state_stage2(s2_cfg, g2, Stage2D(s2_cfg), rng,
                                    batch_size=2)
        net_g = cfg.get("NET_G", "")
        if net_g and os.path.isfile(net_g):
            ckpt = load_torch_checkpoint(net_g)
            s1_import, (p2, s2stats) = import_stage2_g(
                ckpt, s1_cfg, s2_cfg, r_num=r_num)
            if s1_import is not None:
                s1_vars = {"params": {**s1_vars["params"], **s1_import[0]},
                           "batch_stats": {**s1_vars["batch_stats"],
                                           **s1_import[1]}}
            state = state.replace(g_params={**state.g_params, **p2},
                                  g_stats={**state.g_stats, **s2stats})
            print(f"serve: loaded reference stage-2 G from {net_g}",
                  flush=True)
        elif net_g and os.path.isdir(net_g):
            mdir = os.path.join(net_g, "models")
            mgr = CheckpointManager(mdir if os.path.isdir(mdir) else net_g)
            if mgr.latest_epoch() is not None:
                state, ep = mgr.restore(state)
                print(f"serve: restored stage-2 G from {net_g} "
                      f"(epoch {ep})", flush=True)
        else:
            print(f"serve: WARNING NET_G={net_g!r} not found — random "
                  "stage-2 weights", flush=True)

        self.s1_vars = s1_vars
        self.g2_vars = {"params": state.g_params,
                        "batch_stats": state.g_stats}
        self.max_batch = max_batch
        self._rs = np.random.RandomState(seed)
        self._rng = rng
        self._n = 0

        @jax.jit
        def gen(s1_v, g2_v, z, bbox_s1, bbox_s2, labels, text, ca_rng):
            s1_out = g1.apply(s1_v, z, bbox_s1, labels, text, train=False,
                              ca_rng=ca_rng)
            out = g2.apply(g2_v, s1_out["img"], bbox_s1, bbox_s2, labels,
                           text, train=False, ca_rng=ca_rng)
            return out["img"].astype(jnp.float32)

        self._gen = gen
        self.run([{"text_embedding": [0.0] * s1_cfg.text_dim}])  # warm

    def validate(self, item: dict) -> None:
        mc = self.mcfg
        _item_layout(item, mc.num_objects, mc.label_dim,
                     np.random.RandomState(0))
        emb = item.get("text_embedding")
        if emb is None:
            raise ValueError(f"{self.variant} items need a "
                             f"{mc.text_dim}-d text_embedding")
        if np.asarray(emb, np.float32).reshape(-1).size != mc.text_dim:
            raise ValueError(f"text_embedding must have {mc.text_dim} "
                             "values")
        b2 = item.get("bboxes_s2")
        if b2 is not None and len(b2) != len(item.get("bboxes") or b2):
            raise ValueError("bboxes_s2 must match bboxes in length")

    def run(self, items: list) -> list:
        import jax
        import jax.numpy as jnp

        mc = self.mcfg
        B = self.max_batch
        labels = np.zeros((B, mc.num_objects, mc.label_dim), np.float32)
        bbox = np.full((B, mc.num_objects, 4), -1.0, np.float32)
        bbox2 = np.full((B, mc.num_objects, 4), -1.0, np.float32)
        text = np.zeros((B, mc.text_dim), np.float32)
        for i, item in enumerate(items):
            labels[i], bbox[i] = _item_layout(item, mc.num_objects,
                                              mc.label_dim, self._rs)
            b2 = item.get("bboxes_s2")
            if b2 is None:
                bbox2[i] = bbox[i]
            else:
                for o, bb in enumerate(list(b2)):
                    bbox2[i, o] = np.asarray(bb, np.float32)
            emb = item.get("text_embedding")
            if emb is None:
                raise ValueError(f"{self.variant} items need a "
                                 f"{mc.text_dim}-d text_embedding")
            text[i] = np.asarray(emb, np.float32)
        self._n += 1
        key = jax.random.fold_in(self._rng, self._n)
        z = jax.random.normal(key, (B, mc.z_dim))
        imgs = np.asarray(self._gen(
            self.s1_vars, self.g2_vars, z, jnp.asarray(bbox),
            jnp.asarray(bbox2), jnp.asarray(labels), jnp.asarray(text),
            key))
        return [_png_b64(imgs[i]) for i in range(len(items))]


class AttnGanService:
    """Free-text caption -> 256px image (flagship serving path)."""

    def __init__(self, cfg, data_dir: str, img_dir: str, max_batch: int,
                 seed: int):
        import jax
        import jax.numpy as jnp

        from multiple_objects_gan_tpu.cli.attngan_runner import (
            build_all, init_encoders, restore_g)
        from multiple_objects_gan_tpu.data.attngan import AttnGanDataset

        self.words_num = int(cfg.TEXT.WORDS_NUM)
        ds = AttnGanDataset(
            data_dir, img_dir, split="test",
            base_size=int(cfg.TREE.BASE_SIZE),
            branch_num=int(cfg.TREE.BRANCH_NUM),
            captions_per_image=int(cfg.TEXT.CAPTIONS_PER_IMAGE),
            words_num=self.words_num, seed=seed)
        self.wordtoix = ds.wordtoix
        self.mcfg, self.g, d_modules, self.text_enc, image_enc = \
            build_all(cfg, ds.n_words)
        rng = jax.random.PRNGKey(seed)
        enc_vars = init_encoders(cfg, self.text_enc, image_enc,
                                 self.words_num, rng)
        self.text_vars = enc_vars["text"]
        self.g_params, self.g_stats = restore_g(
            cfg, self.mcfg, self.g, d_modules, rng, seq_len=self.words_num)
        self.max_batch = max_batch
        self._rs = np.random.RandomState(seed)
        self._rng = rng
        self._n = 0

        g, text_enc = self.g, self.text_enc

        @jax.jit
        def gen(g_vars, text_vars, caps, lens, bbox, labels, z):
            words, sent = text_enc.apply(text_vars, caps, lens, train=False)
            out = g.apply(g_vars, z, sent, words, caps == 0, bbox, labels,
                          train=False, ca_rng=None)
            return out["imgs"][-1].astype(jnp.float32)

        self._gen = gen
        self.run([{"caption": "a"}])  # warm the executable

    def validate(self, item: dict) -> None:
        """Per-item request validation in the HTTP thread (see
        Stage1Service.validate)."""
        cap = item.get("caption", "")
        if not isinstance(cap, str):
            raise ValueError("caption must be a string")
        _item_layout(item, 3, self.mcfg.label_dim, np.random.RandomState(0))

    def _tokenize(self, caption: str):
        from multiple_objects_gan_tpu.data.attngan import tokenize

        ids = [self.wordtoix[w] for w in tokenize(caption.lower())
               if w in self.wordtoix]
        if not ids:
            ids = [max(self.wordtoix.values())]  # all-OOV: any real token
        return ids[:self.words_num]

    def run(self, items: list) -> list:
        import jax
        import jax.numpy as jnp

        mc = self.mcfg
        B = self.max_batch
        caps = np.zeros((B, self.words_num), np.int32)
        lens = np.ones((B,), np.int32)
        labels = np.zeros((B, 3, mc.label_dim), np.float32)
        bbox = np.full((B, 3, 4), -1.0, np.float32)
        for i, item in enumerate(items):
            ids = self._tokenize(str(item.get("caption", "")))
            caps[i, :len(ids)] = ids
            lens[i] = len(ids)
            labels[i], bbox[i] = _item_layout(item, 3, mc.label_dim,
                                              self._rs)
        self._n += 1
        z = jax.random.normal(jax.random.fold_in(self._rng, self._n),
                              (B, mc.z_dim))
        imgs = np.asarray(self._gen(
            {"params": self.g_params, "batch_stats": self.g_stats},
            self.text_vars, jnp.asarray(caps), jnp.asarray(lens),
            jnp.asarray(bbox), jnp.asarray(labels), z))
        return [_png_b64(imgs[i]) for i in range(len(items))]


def _restore_stage1(cfg, mcfg, state):
    """NET_G resolution shared with cli/sample.py: orbax run dir or
    reference .pth (ref load_network_stageI, trainer.py:59-68)."""
    from multiple_objects_gan_tpu.io.torch_import import (
        maybe_load_reference_g)

    net_g = cfg.get("NET_G", "")
    if net_g and os.path.isdir(net_g):
        from multiple_objects_gan_tpu.io.checkpoint import CheckpointManager

        mdir = os.path.join(net_g, "models")
        mgr = CheckpointManager(mdir if os.path.isdir(mdir) else net_g)
        if mgr.latest_epoch() is not None:
            state, ep = mgr.restore(state)
            print(f"serve: restored G from {net_g} (epoch {ep})",
                  flush=True)
            return state
    loaded = maybe_load_reference_g(net_g, mcfg, state)
    if loaded is not None:
        print(f"serve: loaded reference G from {net_g}", flush=True)
        return loaded
    print(f"serve: WARNING NET_G={net_g!r} not found — random weights",
          flush=True)
    return state


# ---------------------------------------------------------------------------
# HTTP layer


def make_handler(batcher: MicroBatcher, info: dict, validate=None):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet by default
            pass

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True, **info})
            elif self.path == "/stats":
                self._json(200, batcher.snapshot())
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/generate":
                return self._json(404, {"error": "unknown path"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                items = req.get("items", [{}])
                if not isinstance(items, list) or not items:
                    raise ValueError("items must be a non-empty list")
                if len(items) > batcher.max_batch:
                    raise ValueError(
                        f"at most {batcher.max_batch} items per request")
                if validate is not None:
                    for it in items:  # reject HERE, not inside the shared
                        validate(it)  # device batch (one bad item must not
                                      # fail other clients' requests)
                self._json(200, {"images": batcher.submit_many(items)})
            except ValueError as e:
                self._json(400, {"error": str(e)})
            except Exception as e:  # pragma: no cover - defensive
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def build_service(args, cfg):
    if args.variant == "coco-stackgan-2":
        return Stage2Service(cfg, args.max_batch, args.seed)
    if args.variant == "coco-attngan":
        # flags override the YAML, but the YAML's DATA_DIR/IMG_DIR must
        # work on their own (like every other entry point)
        data_dir = args.data_dir or str(cfg.DATA_DIR)
        img_dir = (args.img_dir or str(cfg.get("IMG_DIR", ""))
                   or data_dir)
        return AttnGanService(cfg, data_dir, img_dir, args.max_batch,
                              args.seed)
    return Stage1Service(cfg, args.variant, args.max_batch, args.seed)


def serve(args, cfg) -> ThreadingHTTPServer:
    """Build the service + batcher and return a bound (unstarted) server;
    the CLI calls serve_forever, tests drive it from a thread."""
    svc = build_service(args, cfg)
    batcher = MicroBatcher(svc.run, max_batch=args.max_batch,
                           max_wait_ms=args.max_wait_ms)
    info = {"variant": args.variant, "max_batch": args.max_batch}
    httpd = ThreadingHTTPServer((args.host, args.port),
                                make_handler(batcher, info,
                                             validate=getattr(
                                                 svc, "validate", None)))
    httpd.batcher = batcher  # for tests/stats
    return httpd


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--variant", required=True,
                   choices=["multi-mnist", "clevr", "coco-stackgan-1",
                            "coco-stackgan-2", "coco-attngan"])
    p.add_argument("--cfg", required=True)
    p.add_argument("--net_g", default="",
                   help="orbax output dir or reference .pth (overrides "
                        "cfg NET_G)")
    p.add_argument("--data_dir", default="")
    p.add_argument("--img_dir", default="")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max_batch", type=int, default=64)
    p.add_argument("--max_wait_ms", type=float, default=5.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bf16", action="store_true")
    args = p.parse_args(argv)

    from multiple_objects_gan_tpu.config.config import cfg_from_file

    cfg_variant = ("coco-stackgan"
                   if args.variant in ("coco-stackgan-1", "coco-stackgan-2")
                   else args.variant)
    cfg = cfg_from_file(args.cfg, cfg_variant)
    if args.data_dir:
        cfg.DATA_DIR = args.data_dir
    if args.net_g:
        if args.variant == "coco-attngan":
            cfg.TRAIN.NET_G = args.net_g
        else:
            cfg.NET_G = args.net_g
    if args.bf16:
        import jax.numpy as jnp

        from multiple_objects_gan_tpu.nn import blocks
        blocks.set_compute_dtype(jnp.bfloat16)

    httpd = serve(args, cfg)
    print(f"serving {args.variant} on http://{args.host}:"
          f"{httpd.server_address[1]} (max_batch={args.max_batch}, "
          f"max_wait={args.max_wait_ms}ms)", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.batcher.close()


if __name__ == "__main__":
    main()
