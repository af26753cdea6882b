"""RNN_ENCODER value parity through import_text_encoder.

Oracle: modern-torch replica of the reference DAMSM text encoder
(code/coco/attngan/model.py:120-204: embedding + bi-LSTM over packed
sequences; words = padded output, sent = concat of final hiddens), with
the published checkpoints' key names (encoder.weight, rnn.*_l0{,_reverse}).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
from torch.nn.utils.rnn import (  # noqa: E402
    pack_padded_sequence, pad_packed_sequence)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

NTOKEN, NINPUT, NHIDDEN, T = 23, 8, 6, 7


class RNNEncoderTorch(tnn.Module):
    def __init__(self):
        super().__init__()
        self.encoder = tnn.Embedding(NTOKEN, NINPUT)
        self.rnn = tnn.LSTM(NINPUT, NHIDDEN // 2, 1, batch_first=True,
                            bidirectional=True)

    def forward(self, captions, cap_lens):
        emb = self.encoder(captions)
        packed = pack_padded_sequence(emb, cap_lens, batch_first=True,
                                      enforce_sorted=False)
        out, (h, _) = self.rnn(packed)
        words, _ = pad_packed_sequence(out, batch_first=True,
                                       total_length=T)
        sent = h.transpose(0, 1).reshape(captions.shape[0], -1)
        return words, sent


def test_text_encoder_import_value_parity(tmp_path):
    from multiple_objects_gan_tpu.io.damsm_import import import_text_encoder
    from multiple_objects_gan_tpu.nn.encoders import RNNEncoder

    torch.manual_seed(0)
    oracle = RNNEncoderTorch().eval()
    pth = tmp_path / "text_encoder_test.pth"
    torch.save(oracle.state_dict(), pth)

    rng = np.random.RandomState(0)
    caps = np.zeros((3, T), np.int32)
    lens = np.array([7, 4, 1], np.int32)
    for i, l in enumerate(lens):
        caps[i, :l] = rng.randint(1, NTOKEN, l)

    with torch.no_grad():
        t_words, t_sent = oracle(torch.from_numpy(caps).long(),
                                 torch.from_numpy(lens).long())

    enc = RNNEncoder(ntoken=NTOKEN, ninput=NINPUT, nhidden=NHIDDEN)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(caps),
                         jnp.asarray(lens), train=False)
    variables = import_text_encoder(str(pth), variables)
    j_words, j_sent = enc.apply(variables, jnp.asarray(caps),
                                jnp.asarray(lens), train=False)

    np.testing.assert_allclose(np.asarray(j_sent), t_sent.numpy(),
                               atol=1e-5)
    # padded positions are zero in both (pad_packed vs explicit mask)
    np.testing.assert_allclose(np.asarray(j_words), t_words.numpy(),
                               atol=1e-5)
