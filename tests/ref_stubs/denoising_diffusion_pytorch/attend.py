"""Attend stub: plain scaled-dot-product softmax attention (the pinned
library's non-flash path; SURVEY.md section 2.11 — the reference repo
defaults flash_attn False and forces it off for torch<2.0)."""

import torch
from torch import einsum, nn


class Attend(nn.Module):
    def __init__(self, dropout=0., flash=False, scale=None):
        super().__init__()
        self.dropout = dropout
        self.flash = flash
        self.scale = scale

    def forward(self, q, k, v):
        scale = self.scale if self.scale is not None else q.shape[-1] ** -0.5
        sim = einsum('b h i d, b h j d -> b h i j', q, k) * scale
        attn = sim.softmax(dim=-1)
        attn = torch.dropout(attn, self.dropout, train=self.training)
        return einsum('b h i j, b h j d -> b h i d', attn, v)
