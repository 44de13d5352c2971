"""Test-only pure-torch DCNv2 oracle (grid_sample based).

Substitutes the reference's CUDA extension so reference architectures can
run on CPU as parity oracles.  Matches the CUDA kernel semantics: offset
channel layout (dg, K, 2)=(dh, dw), sigmoid-masked taps, zero padding.
"""
import torch
import torch.nn.functional as F


def torch_modulated_deform_conv(x, offset, mask, weight, bias=None, stride=1,
                                padding=0, dilation=1, groups=1,
                                deformable_groups=1):
    b, c, h, w = x.shape
    out_c, cin_g, kh, kw = weight.shape
    k = kh * kw
    dg = deformable_groups
    cpg = c // dg
    ho = (h + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    wo = (w + 2 * padding - (dilation * (kw - 1) + 1)) // stride + 1

    off = offset.view(b, dg, k, 2, ho, wo)
    oy = torch.arange(ho, dtype=x.dtype) * stride - padding
    ox = torch.arange(wo, dtype=x.dtype) * stride - padding
    ky, kx = torch.meshgrid(
        torch.arange(kh, dtype=x.dtype) * dilation,
        torch.arange(kw, dtype=x.dtype) * dilation, indexing="ij")
    base_y = oy.view(1, ho, 1) + ky.reshape(-1).view(k, 1, 1)
    base_x = ox.view(1, 1, wo) + kx.reshape(-1).view(k, 1, 1)
    pos_y = base_y.unsqueeze(0).unsqueeze(0) + off[:, :, :, 0]  # (b,dg,k,ho,wo)
    pos_x = base_x.unsqueeze(0).unsqueeze(0) + off[:, :, :, 1]

    gx = 2 * pos_x / max(w - 1, 1) - 1
    gy = 2 * pos_y / max(h - 1, 1) - 1
    grid = torch.stack([gx, gy], dim=-1).view(b * dg, k * ho, wo, 2)
    xg = x.view(b, dg, cpg, h, w).reshape(b * dg, cpg, h, w)
    sampled = F.grid_sample(xg, grid, mode="bilinear", padding_mode="zeros",
                            align_corners=True)
    sampled = sampled.view(b, dg, cpg, k, ho, wo)
    if mask is not None:
        sampled = sampled * mask.view(b, dg, 1, k, ho, wo)
    cols = sampled.reshape(b, c, k, ho, wo)

    og = out_c // groups
    cols = cols.view(b, groups, cin_g, k, ho, wo)
    wg = weight.view(groups, og, cin_g, k)
    out = torch.einsum("goik,bgikhw->bgohw", wg, cols).reshape(b, out_c, ho, wo)
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


def install(ref_dcn_module):
    """Monkeypatch the reference dcn module to use this oracle."""
    ref_dcn_module.modulated_deform_conv = torch_modulated_deform_conv
    ref_dcn_module.deform_conv = (
        lambda x, offset, weight, stride=1, padding=0, dilation=1, groups=1,
        deformable_groups=1, im2col_step=64: torch_modulated_deform_conv(
            x, offset, None, weight, None,
            stride if isinstance(stride, int) else stride[0],
            padding if isinstance(padding, int) else padding[0],
            dilation if isinstance(dilation, int) else dilation[0],
            groups, deformable_groups)
    )
