"""Torch re-implementation of the reference model + inference algorithm.

Test-harness only: builds the same network shape as the reference
TransducerGRU (helen/modules/python/models/TransducerModel.py:43-79) with
torch primitives and replays the reference's sliding-window voting loop
(predict_gpu.py:94-159) so helen_tpu numerics can be validated against torch
CPU — the same engine the reference runs on CPU.
"""
import numpy as np
import torch
import torch.nn as nn


class TorchTransducer(nn.Module):
    def __init__(self, features=90, hidden=128, base_classes=5, rle_classes=11,
                 gru_layers=1):
        super().__init__()
        self.hidden_size = hidden
        self.gru_layers = gru_layers
        self.gru_encoder = nn.GRU(features, hidden, num_layers=gru_layers, bidirectional=True, batch_first=True)
        self.gru_decoder = nn.GRU(2 * hidden, hidden, num_layers=gru_layers, bidirectional=True, batch_first=True)
        self.dense1_base = nn.Linear(2 * hidden, base_classes)
        self.dense2_rle = nn.Linear(2 * hidden, rle_classes)

    def forward(self, x, hidden):
        hidden = hidden.transpose(0, 1).contiguous()
        x1, h1 = self.gru_encoder(x, hidden)
        x2, h2 = self.gru_decoder(x1, h1)
        return self.dense1_base(x2), self.dense2_rle(x2), h2.transpose(0, 1).contiguous()


@torch.no_grad()
def reference_consensus(model, images, window=100, jump=50, base_classes=5, rle_classes=11):
    """Replay of the reference predict loop: returns (base_probs, rle_probs,
    base_labels, rle_labels) as numpy arrays."""
    model.eval()
    images = torch.as_tensor(images, dtype=torch.float32)
    B, L, _ = images.shape
    hidden = torch.zeros(B, 2 * getattr(model, "gru_layers", 1), model.hidden_size)
    base_acc = torch.zeros(B, L, base_classes)
    rle_acc = torch.zeros(B, L, rle_classes)
    for i in range(0, L, jump):
        if i + window > L:
            break
        chunk = images[:, i : i + window]
        ob, orle, hidden = model(chunk, hidden)
        base_acc[:, i : i + window] += torch.softmax(ob, dim=2)
        rle_acc[:, i : i + window] += torch.softmax(orle, dim=2)
    _, base_labels = torch.max(base_acc, 2)
    _, rle_labels = torch.max(rle_acc, 2)
    return (
        base_acc.numpy(),
        rle_acc.numpy(),
        base_labels.numpy().astype(np.uint8),
        rle_labels.numpy().astype(np.uint8),
    )
