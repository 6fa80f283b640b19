"""Minimal PyTorch oracle of the PoseNDF architecture, used only in tests.

Freshly written from the architecture description (21 BoneMLPs over the
kinematic tree + MLP head with output activation + joint-axis input
normalization) to validate the JAX model and the torch-checkpoint importer
to <= 1e-4, per the parity requirement. CPU torch only.
"""

import torch
import torch.nn as nn

PARENTS = [-1, -1, -1, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19]


def _act(name, beta):
    if name == "lrelu":
        return nn.LeakyReLU()
    if name == "relu":
        return nn.ReLU()
    if name == "softplus":
        return nn.Softplus(beta=beta)
    raise ValueError(name)


class TorchBoneMLP(nn.Module):
    def __init__(self, parent, act="lrelu", beta=100.0, bone_dim=4, feat=6):
        super().__init__()
        in_f = bone_dim if parent == -1 else bone_dim + feat
        hid = bone_dim + feat
        self.net = nn.Sequential(
            nn.Linear(in_f, hid), _act(act, beta), nn.Linear(hid, feat), _act(act, beta)
        )

    def forward(self, x):
        return self.net(x)


class TorchStructureEncoder(nn.Module):
    def __init__(self, act="lrelu", beta=100.0, feat=6):
        super().__init__()
        self.parents = PARENTS
        self.net = nn.ModuleList(
            [TorchBoneMLP(p, act, beta, feat=feat) for p in self.parents]
        )

    def forward(self, quat):
        feats = [None] * len(self.parents)
        for i, mlp in enumerate(self.net):
            p = self.parents[i]
            if p == -1:
                feats[i] = mlp(quat[:, i, :])
            else:
                feats[i] = mlp(torch.cat([quat[:, i, :], feats[p]], dim=-1))
        return torch.cat(feats, dim=-1)


class TorchDFNet(nn.Module):
    def __init__(self, in_dim=126, dims=(256, 512, 1024, 512, 256, 64), act="lrelu", beta=100.0):
        super().__init__()
        widths = [in_dim] + list(dims) + [1]
        self.num_layers = len(widths)
        for l in range(self.num_layers - 1):
            setattr(self, f"lin{l}", nn.Linear(widths[l], widths[l + 1]))
        self.actv = _act(act, beta)
        self.out_actv = nn.ReLU() if act in ("lrelu", "relu") else nn.Softplus(beta=beta)

    def forward(self, x):
        x = x.reshape(len(x), -1)
        for l in range(self.num_layers - 1):
            x = getattr(self, f"lin{l}")(x)
            if l < self.num_layers - 2:
                x = self.actv(x)
        return self.out_actv(x)


class TorchPoseNDF(nn.Module):
    def __init__(self, act="lrelu", beta=100.0, use_encoder=True):
        super().__init__()
        self.enc = TorchStructureEncoder(act, beta) if use_encoder else None
        in_dim = 126 if use_encoder else 84
        self.dfnet = TorchDFNet(in_dim=in_dim, act=act, beta=beta)

    def forward(self, pose, normalize_input=True):
        pose = pose.reshape(-1, 21, 4)
        x = torch.nn.functional.normalize(pose, dim=1) if normalize_input else pose
        if self.enc is not None:
            x = self.enc(x)
        return self.dfnet(x)
