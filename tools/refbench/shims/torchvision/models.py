"""``torchvision.models.vgg11_bn`` shim: identical module tree and state_dict
key set (features/avgpool/classifier with configuration-"A" indices), built
from public torch layers. ``pretrained=True`` is rejected — no network egress
exists here; the reference is always run with --vgg_wts_path pointing at a
local state_dict (reference model.py:86-90 then loads it itself)."""

import torch.nn as nn

VGG11_CFG = [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"]


class VGG(nn.Module):
    def __init__(self):
        super().__init__()
        feats, in_c = [], 3
        for v in VGG11_CFG:
            if v == "M":
                feats.append(nn.MaxPool2d(2, 2))
            else:
                feats += [nn.Conv2d(in_c, v, 3, padding=1), nn.BatchNorm2d(v),
                          nn.ReLU(inplace=True)]
                in_c = v
        self.features = nn.Sequential(*feats)
        self.avgpool = nn.AdaptiveAvgPool2d((7, 7))
        self.classifier = nn.Sequential(
            nn.Linear(512 * 7 * 7, 4096), nn.ReLU(True), nn.Dropout(),
            nn.Linear(4096, 4096), nn.ReLU(True), nn.Dropout(),
            nn.Linear(4096, 1000))
        for m in self.modules():
            if isinstance(m, nn.Conv2d):
                nn.init.kaiming_normal_(m.weight, mode="fan_out",
                                        nonlinearity="relu")
                nn.init.constant_(m.bias, 0)
            elif isinstance(m, nn.BatchNorm2d):
                nn.init.constant_(m.weight, 1)
                nn.init.constant_(m.bias, 0)
            elif isinstance(m, nn.Linear):
                nn.init.normal_(m.weight, 0, 0.01)
                nn.init.constant_(m.bias, 0)

    def forward(self, x):
        x = self.avgpool(self.features(x))
        return self.classifier(x.flatten(1))


def vgg11_bn(pretrained: bool = False, **kwargs):
    if pretrained:
        raise RuntimeError(
            "torchvision shim: no pretrained download available (zero egress); "
            "pass --vgg_wts_path with a local vgg11_bn state_dict")
    return VGG()
