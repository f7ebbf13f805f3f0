"""Minimal torch modules reproducing the reference model layouts (timm ViT /
HF BERT / SimSeg projections) for checkpoint-bridge and numerical-parity
tests. These are test fixtures: independent re-implementations of the public
architectures, with state-dict key names matching what the bridge must load.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchViTBlock(nn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, dim * 3)
        self.attn.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, dim * 4)
        self.mlp.fc2 = nn.Linear(dim * 4, dim)
        self.heads = heads

    def forward(self, x):
        b, t, d = x.shape
        h = self.heads
        y = self.norm1(x)
        qkv = self.attn.qkv(y).reshape(b, t, 3, h, d // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = (q @ k.transpose(-2, -1)) / math.sqrt(d // h)
        att = att.softmax(-1)
        y = (att @ v).transpose(1, 2).reshape(b, t, d)
        x = x + self.attn.proj(y)
        y = self.norm2(x)
        y = self.mlp.fc2(F.gelu(self.mlp.fc1(y)))
        return x + y


class TorchViT(nn.Module):
    """timm-layout ViT; forward mirrors reference vit_builder.py:13-21
    (returns the full token sequence)."""

    def __init__(self, img_size=32, patch=8, dim=32, depth=2, heads=2):
        super().__init__()
        n = (img_size // patch) ** 2
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch, stride=patch)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, 1 + n, dim))
        self.blocks = nn.ModuleList([TorchViTBlock(dim, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):  # x: (B, 3, H, W)
        x = self.patch_embed.proj(x)
        x = x.flatten(2).transpose(1, 2)
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)


class TorchBertLayer(nn.Module):
    def __init__(self, dim, heads, inter):
        super().__init__()
        self.attention = nn.Module()
        self.attention.self = nn.Module()
        self.attention.self.query = nn.Linear(dim, dim)
        self.attention.self.key = nn.Linear(dim, dim)
        self.attention.self.value = nn.Linear(dim, dim)
        self.attention.output = nn.Module()
        self.attention.output.dense = nn.Linear(dim, dim)
        self.attention.output.LayerNorm = nn.LayerNorm(dim, eps=1e-12)
        self.intermediate = nn.Module()
        self.intermediate.dense = nn.Linear(dim, inter)
        self.output = nn.Module()
        self.output.dense = nn.Linear(inter, dim)
        self.output.LayerNorm = nn.LayerNorm(dim, eps=1e-12)
        self.heads = heads

    def forward(self, x, bias):
        b, t, d = x.shape
        h = self.heads

        def split(z):
            return z.reshape(b, t, h, d // h).permute(0, 2, 1, 3)

        q = split(self.attention.self.query(x))
        k = split(self.attention.self.key(x))
        v = split(self.attention.self.value(x))
        att = (q @ k.transpose(-2, -1)) / math.sqrt(d // h)
        if bias is not None:
            att = att + bias
        att = att.softmax(-1)
        y = (att @ v).permute(0, 2, 1, 3).reshape(b, t, d)
        x = self.attention.output.LayerNorm(x + self.attention.output.dense(y))
        y = self.output.dense(F.gelu(self.intermediate.dense(x)))
        return self.output.LayerNorm(x + y)


class TorchBert(nn.Module):
    """HF-layout BERT encoder (embeddings + layers, no pooler)."""

    def __init__(self, vocab=128, dim=32, depth=2, heads=2, inter=64, max_pos=64):
        super().__init__()
        self.embeddings = nn.Module()
        self.embeddings.word_embeddings = nn.Embedding(vocab, dim)
        self.embeddings.position_embeddings = nn.Embedding(max_pos, dim)
        self.embeddings.token_type_embeddings = nn.Embedding(2, dim)
        self.embeddings.LayerNorm = nn.LayerNorm(dim, eps=1e-12)
        self.encoder = nn.Module()
        self.encoder.layer = nn.ModuleList(
            [TorchBertLayer(dim, heads, inter) for _ in range(depth)]
        )

    def forward(self, input_ids, attention_mask=None):
        t = input_ids.shape[1]
        pos = torch.arange(t)[None, :]
        x = (
            self.embeddings.word_embeddings(input_ids)
            + self.embeddings.position_embeddings(pos)
            + self.embeddings.token_type_embeddings(torch.zeros_like(input_ids))
        )
        x = self.embeddings.LayerNorm(x)
        bias = None
        if attention_mask is not None:
            bias = (1.0 - attention_mask[:, None, None, :].float()) * -1e9
        for layer in self.encoder.layer:
            x = layer(x, bias)
        return x


class TorchBackboneWrapper(nn.Module):
    """HuggingFaceModel/ViTModel-style wrapper: the backbone sits at .model
    and forward delegates (huggingface_builder.py:6-17), so state-dict keys
    gain the second `.model.` level the reference layout has."""

    def __init__(self, inner):
        super().__init__()
        self.model = inner

    def forward(self, *args, **kwargs):
        return self.model(*args, **kwargs)


class TorchTinyCLIP(nn.Module):
    """State-dict-compatible stand-in for the reference CLIPModel
    (image_encoder.model.model.*, text_encoder.model.model.*,
    *_projection.linear, loss.temperature)."""

    def __init__(self, proj_dim=16, vit_kwargs=None, bert_kwargs=None):
        super().__init__()
        vit_kwargs = vit_kwargs or {}
        bert_kwargs = bert_kwargs or {}
        self.image_encoder = nn.Module()
        self.image_encoder.model = nn.Module()
        self.image_encoder.model.model = TorchViT(**vit_kwargs)
        self.text_encoder = nn.Module()
        self.text_encoder.model = TorchBackboneWrapper(TorchBert(**bert_kwargs))
        vdim = vit_kwargs.get("dim", 32)
        tdim = bert_kwargs.get("dim", 32)
        self.image_projection = nn.Module()
        self.image_projection.linear = nn.Linear(vdim, proj_dim, bias=False)
        self.text_projection = nn.Module()
        self.text_projection.linear = nn.Linear(tdim, proj_dim, bias=False)
        self.loss = nn.Module()
        self.loss.temperature = nn.Parameter(torch.tensor(0.03))


def torch_topk_pool(x, k, mask=None):
    if mask is not None:
        x = x.masked_fill((mask == 0).unsqueeze(-1), -10000.0)
        k = min(k, int(mask.sum(1).min()))
    vals = x.topk(k, dim=1)[0]
    return vals.mean(dim=1)


def torch_clip_embeddings(model: TorchTinyCLIP, image, input_ids, attention_mask,
                          image_k=3, text_k=1):
    """Reference CLIPModel.forward(embeddings='all') semantics
    (pipelines/clip.py:152-176) on the torch fixture."""
    img_tokens = model.image_encoder.model.model(image)[:, 1:]
    txt_tokens = model.text_encoder.model(input_ids, attention_mask)

    img_emb = torch_topk_pool(model.image_projection.linear(img_tokens), image_k)
    txt_emb = torch_topk_pool(
        model.text_projection.linear(txt_tokens), text_k, attention_mask
    )
    img_emb = F.normalize(img_emb, dim=-1)
    txt_emb = F.normalize(txt_emb, dim=-1)
    return img_emb, txt_emb


class TorchBottleneck(nn.Module):
    def __init__(self, inplanes, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * 4),
            )

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + idn)


class TorchTinyResNet(nn.Module):
    """torchvision-layout tiny ResNet matching flax RESNET_CONFIGS
    'resnet_test' (layers (1,1), width 8); global_pool='' semantics."""

    def __init__(self, width=8):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = nn.Sequential(TorchBottleneck(width, width, 1, True))
        self.layer2 = nn.Sequential(TorchBottleneck(width * 4, width * 2, 2, True))

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        return x  # (B, C, h, w)


class TorchBasicBlock(nn.Module):
    """torchvision BasicBlock (resnet18/34 layout, expansion 1)."""

    def __init__(self, inplanes, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = None
        if downsample:
            self.downsample = nn.Sequential(
                nn.Conv2d(inplanes, planes, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes),
            )

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + idn)


class TorchTinyBasicResNet(nn.Module):
    """torchvision-layout tiny basic-block ResNet matching flax
    RESNET_CONFIGS 'resnet_basic_test' (layers (1,1), width 8)."""

    def __init__(self, width=8):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = nn.Sequential(TorchBasicBlock(width, width))
        self.layer2 = nn.Sequential(
            TorchBasicBlock(width, width * 2, stride=2, downsample=True))

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        return x


class TorchLayerNorm2d(nn.Module):
    """timm LayerNorm2d: LayerNorm over the channel dim of NCHW (weight/bias
    keys match nn.LayerNorm)."""

    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.bias = nn.Parameter(torch.zeros(dim))
        self.eps = eps

    def forward(self, x):  # (B, C, H, W)
        x = x.permute(0, 2, 3, 1)
        x = F.layer_norm(x, x.shape[-1:], self.weight, self.bias, self.eps)
        return x.permute(0, 3, 1, 2)


class TorchConvNeXtBlock(nn.Module):
    """timm-0.6.x ConvNeXt block key layout: conv_dw / norm / mlp.fc1 /
    mlp.fc2 / gamma."""

    def __init__(self, dim):
        super().__init__()
        self.conv_dw = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, 4 * dim)
        self.mlp.fc2 = nn.Linear(4 * dim, dim)
        self.gamma = nn.Parameter(1e-6 * torch.ones(dim))

    def forward(self, x):
        h = self.conv_dw(x).permute(0, 2, 3, 1)
        h = self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm(h))))
        return x + (self.gamma * h).permute(0, 3, 1, 2)


class TorchTinyConvNeXt(nn.Module):
    """timm-layout tiny ConvNeXt matching flax CONVNEXT_CONFIGS
    'convnext_test' (depths (1, 1), dims (8, 16)); num_classes=0 +
    global_pool='' semantics (spatial map, head norm applied)."""

    def __init__(self, depths=(1, 1), dims=(8, 16)):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(3, dims[0], 4, stride=4), TorchLayerNorm2d(dims[0]))
        self.stages = nn.ModuleList()
        prev = dims[0]
        for i, (depth, dim) in enumerate(zip(depths, dims)):
            stage = nn.Module()
            if i > 0:
                stage.downsample = nn.Sequential(
                    TorchLayerNorm2d(prev), nn.Conv2d(prev, dim, 2, stride=2))
            else:
                stage.downsample = nn.Identity()
            stage.blocks = nn.Sequential(
                *[TorchConvNeXtBlock(dim) for _ in range(depth)])
            self.stages.append(stage)
            prev = dim
        self.head = nn.Module()
        self.head.norm = TorchLayerNorm2d(dims[-1])

    def forward(self, x):
        x = self.stem(x)
        for stage in self.stages:
            x = stage.blocks(stage.downsample(x))
        return self.head.norm(x)  # (B, C, h, w)


class TorchSqueezeExcite(nn.Module):
    def __init__(self, chs, rd_chs):
        super().__init__()
        self.conv_reduce = nn.Conv2d(chs, rd_chs, 1)
        self.conv_expand = nn.Conv2d(rd_chs, chs, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = self.conv_expand(F.silu(self.conv_reduce(s)))
        return x * torch.sigmoid(s)


class TorchDsConv(nn.Module):
    """timm DepthwiseSeparableConv key layout (expand-ratio-1 stage)."""

    def __init__(self, in_chs, out_chs, kernel=3, stride=1, se_ratio=0.25):
        super().__init__()
        self.conv_dw = nn.Conv2d(in_chs, in_chs, kernel, stride=stride,
                                 padding=kernel // 2, groups=in_chs,
                                 bias=False)
        self.bn1 = nn.BatchNorm2d(in_chs)
        self.se = TorchSqueezeExcite(in_chs, max(1, int(in_chs * se_ratio)))
        self.conv_pw = nn.Conv2d(in_chs, out_chs, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_chs)
        self.has_skip = stride == 1 and in_chs == out_chs

    def forward(self, x):
        h = self.se(F.silu(self.bn1(self.conv_dw(x))))
        h = self.bn2(self.conv_pw(h))
        return h + x if self.has_skip else h


class TorchInvertedResidual(nn.Module):
    """timm InvertedResidual (MBConv) key layout."""

    def __init__(self, in_chs, out_chs, expand=6, kernel=3, stride=1,
                 se_ratio=0.25):
        super().__init__()
        mid = in_chs * expand
        self.conv_pw = nn.Conv2d(in_chs, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid)
        self.conv_dw = nn.Conv2d(mid, mid, kernel, stride=stride,
                                 padding=kernel // 2, groups=mid, bias=False)
        self.bn2 = nn.BatchNorm2d(mid)
        self.se = TorchSqueezeExcite(mid, max(1, int(in_chs * se_ratio)))
        self.conv_pwl = nn.Conv2d(mid, out_chs, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out_chs)
        self.has_skip = stride == 1 and in_chs == out_chs

    def forward(self, x):
        h = F.silu(self.bn1(self.conv_pw(x)))
        h = self.se(F.silu(self.bn2(self.conv_dw(h))))
        h = self.bn3(self.conv_pwl(h))
        return h + x if self.has_skip else h


class TorchTinyEfficientNet(nn.Module):
    """timm-layout tiny EfficientNet matching flax EFFICIENTNET_CONFIGS
    'efficientnet_test' (stages ((1,8,1,1,3),(6,16,2,2,3)), stem 8,
    head 32); forward_features semantics (conv_head+bn2+SiLU, no pool)."""

    def __init__(self):
        super().__init__()
        self.conv_stem = nn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(8)
        self.blocks = nn.ModuleList([
            nn.Sequential(TorchDsConv(8, 8)),
            nn.Sequential(TorchInvertedResidual(8, 16, stride=2),
                          TorchInvertedResidual(16, 16)),
        ])
        self.conv_head = nn.Conv2d(16, 32, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(32)

    def forward(self, x):
        x = F.silu(self.bn1(self.conv_stem(x)))
        for stage in self.blocks:
            x = stage(x)
        return F.silu(self.bn2(self.conv_head(x)))  # (B, C, h, w)
