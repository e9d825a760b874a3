"""Partial-convolution module shim (reference: partial_conv.py). The
mask-propagating convolution lives in pose_tpu.ops.partial_conv as a
functional op with a Pallas renormalization kernel; `PartialConv` wraps it
with the reference's (input, mask_in) -> (output, mask_out) call shape."""

from pose_tpu.ops.partial_conv import partial_conv, renormalize_xla

__all__ = ['PartialConv', 'partial_conv', 'renormalize_xla']


class PartialConv:
    """Functional stand-in for the reference's nn.Conv2d subclass
    (partial_conv.py:6-58): construct with a kernel (HWIO) and conv params,
    call with (input NHWC, mask (B,H,W,1))."""

    def __init__(self, kernel, stride=1, padding=0, dilation=1, bias=None):
        self.kernel = kernel
        self.stride = stride
        self.padding = padding
        self.dilation = dilation
        self.bias = bias

    def __call__(self, x, mask_in):
        return partial_conv(x, mask_in, self.kernel, self.stride,
                            self.padding, self.dilation, self.bias)
