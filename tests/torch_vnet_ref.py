"""Independent PyTorch V-Net used ONLY as a parity oracle in tests.

Written from the architecture description in SURVEY.md §3.3 (channels
16->256, stride-2 2^3 down/up convs, conv-BN-ReLU residual chains {1,2,3,3}/
{3,3,2,1}, skip concats, softmax output). Module definition order matches
the flax model's parameter order so `compat.torch_import` can align the two
positionally.
"""
import torch
import torch.nn as nn


class ConvBnRelu(nn.Module):
    def __init__(self, cin, cout, k=3):
        super().__init__()
        self.conv = nn.Conv3d(cin, cout, k, padding=k // 2)
        self.bn = nn.BatchNorm3d(cout, eps=1e-5, momentum=0.1)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class ResBlock(nn.Module):
    def __init__(self, c, n):
        super().__init__()
        self.convs = nn.ModuleList([ConvBnRelu(c, c) for _ in range(n)])

    def forward(self, x):
        h = x
        for m in self.convs:
            h = m(h)
        return torch.relu(x + h)


class Down(nn.Module):
    def __init__(self, cin, cout, n):
        super().__init__()
        self.down_conv = nn.Conv3d(cin, cout, 2, stride=2)
        self.down_bn = nn.BatchNorm3d(cout)
        self.res = ResBlock(cout, n)

    def forward(self, x):
        return self.res(torch.relu(self.down_bn(self.down_conv(x))))


class Up(nn.Module):
    def __init__(self, cin, cout_total, n):
        super().__init__()
        self.up_conv = nn.ConvTranspose3d(cin, cout_total // 2, 2, stride=2)
        self.up_bn = nn.BatchNorm3d(cout_total // 2)
        self.res = ResBlock(cout_total, n)

    def forward(self, x, skip):
        x = torch.relu(self.up_bn(self.up_conv(x)))
        return self.res(torch.cat([x, skip], dim=1))


class _NamedCBR(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Conv3d(cin, cout, 3, padding=1)
        self.bn = nn.BatchNorm3d(cout)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class _NamedInBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = _NamedCBR(cin, cout)

    def forward(self, x):
        return self.conv(x)


class _NamedRes(nn.Module):
    def __init__(self, c, n):
        super().__init__()
        self.n = n
        for i in range(n):
            self.add_module(f"conv{i}", _NamedCBR(c, c))

    def forward(self, x):
        h = x
        for i in range(self.n):
            h = getattr(self, f"conv{i}")(h)
        return torch.relu(x + h)


class _NamedDown(nn.Module):
    def __init__(self, cin, cout, n):
        super().__init__()
        self.down_conv = nn.Conv3d(cin, cout, 2, stride=2)
        self.down_bn = nn.BatchNorm3d(cout)
        self.res = _NamedRes(cout, n)

    def forward(self, x):
        return self.res(torch.relu(self.down_bn(self.down_conv(x))))


class _NamedUp(nn.Module):
    def __init__(self, cin, c, n):
        super().__init__()
        self.up_conv = nn.ConvTranspose3d(cin, c // 2, 2, stride=2)
        self.up_bn = nn.BatchNorm3d(c // 2)
        self.res = _NamedRes(c, n)

    def forward(self, x, skip):
        x = torch.relu(self.up_bn(self.up_conv(x)))
        return self.res(torch.cat([x, skip], dim=1))


class _NamedOutBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = _NamedCBR(cin, cout)
        self.proj = nn.Conv3d(cout, cout, 1)

    def forward(self, x):
        return torch.softmax(self.proj(self.conv(x)), dim=1)


class NamedTorchVNet(nn.Module):
    """Torch V-Net whose module tree mirrors the flax model's NAMES
    (``in_block / down_<2c> / up_<c> / out_block``, ``down_conv``/``up_conv``/
    ``res.conv<i>``), so checkpoints saved by this framework restore with
    ``load_state_dict(strict=True)`` — the reverse-interop oracle for
    SURVEY.md C13. Caveat: the REAL reference's attribute names are [M]
    confidence (mount empty, SURVEY §0); this verifies types/shapes/layouts/
    BN counters mechanically against torch's strict loader."""

    def __init__(self, in_ch, out_ch, base=16,
                 down_convs=(1, 2, 3, 3), up_convs=(3, 3, 2, 1)):
        super().__init__()
        self.in_block = _NamedInBlock(in_ch, base)
        c = base
        self._downs, self._ups = [], []
        for n in down_convs:
            m = _NamedDown(c, 2 * c, n)
            self.add_module(f"down_{2 * c}", m)
            self._downs.append(m)
            c *= 2
        prev = c
        for n in up_convs:
            m = _NamedUp(prev, c, n)
            self.add_module(f"up_{c}", m)
            self._ups.append(m)
            prev = c
            c //= 2
        self.out_block = _NamedOutBlock(prev, out_ch)

    def forward(self, x):
        x = self.in_block(x)
        skips = [x]
        for i, d in enumerate(self._downs):
            x = d(x)
            if i + 1 < len(self._downs):
                skips.append(x)
        for u in self._ups:
            x = u(x, skips.pop())
        return self.out_block(x)


class TorchVNet(nn.Module):
    def __init__(self, in_ch, out_ch, base=16,
                 down_convs=(1, 2, 3, 3), up_convs=(3, 3, 2, 1)):
        super().__init__()
        c = base
        self.in_block = ConvBnRelu(in_ch, c)
        downs = []
        for n in down_convs:
            downs.append(Down(c, c * 2, n))
            c *= 2
        self.downs = nn.ModuleList(downs)
        ups = []
        prev = c  # bottleneck output channels
        for n in up_convs:
            ups.append(Up(prev, c, n))
            prev = c
            c //= 2
        self.ups = nn.ModuleList(ups)
        self.out_conv = ConvBnRelu(prev, out_ch)
        self.proj = nn.Conv3d(out_ch, out_ch, 1)

    def forward(self, x):
        x = self.in_block(x)
        skips = [x]
        for i, d in enumerate(self.downs):
            x = d(x)
            if i + 1 < len(self.downs):
                skips.append(x)
        for u in self.ups:
            x = u(x, skips.pop())
        x = self.out_conv(x)
        return torch.softmax(self.proj(x), dim=1)
