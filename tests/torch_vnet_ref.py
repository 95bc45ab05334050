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
