from univs_tpu.models.backbones.resnet import ResNet, build_backbone
