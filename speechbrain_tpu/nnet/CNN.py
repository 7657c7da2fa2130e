"""Convolutional layers on (batch, time, [height,] channel) layouts.

Capability parity with the reference's ``speechbrain/nnet/CNN.py``
(SincConv :30, Conv1d :314, Conv2d :528, ConvTranspose1d :782,
DepthwiseSeparableConv1d :1120, GaborConv1d :1221), built on
``jax.lax.conv_general_dilated`` in NWC/NHWC layouts (the TPU-native
layouts — channels-last feeds the MXU directly).

Padding semantics mirror the reference: "same" keeps L_out = ceil(L/stride),
"causal" left-pads by (K-1)*dilation, "valid" no padding.
"""

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _same_pad_1d(L, kernel, stride, dilation):
    """'same' padding amounts, matching the reference's get_padding_elem
    (ref nnet/CNN.py:1510): symmetric floor((L_in - L_out)/2) for stride 1,
    floor(kernel/2) each side (dilation ignored) for stride > 1."""
    if stride > 1:
        p = kernel // 2
        return p, p
    L_out = (L - dilation * (kernel - 1) - 1) // stride + 1
    p = (L - L_out) // 2
    return p, p


class Conv1d(nn.Module):
    """1-D convolution on (batch, time, channel).

    Arguments mirror the reference Conv1d (nnet/CNN.py:314): out_channels,
    kernel_size, stride, dilation, padding in {"same","causal","valid"} or
    an int, groups, bias, weight norms are omitted (XLA fuses normalization).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> conv = Conv1d(out_channels=25, kernel_size=11)
    >>> x = jnp.ones((10, 40, 16))
    >>> p = conv.init(jax.random.PRNGKey(0), x)
    >>> conv.apply(p, x).shape
    (10, 40, 25)
    """

    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    padding: str = "same"
    groups: int = 1
    bias: bool = True
    # reflect matches the reference Conv1d default (ref nnet/CNN.py:86);
    # checkpoint-parity tests fail at the edges with constant padding
    padding_mode: str = "reflect"
    skip_transpose: bool = True  # accepted for API parity; layout is NWC
    weight_norm: bool = False
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        unsqueezed = x.ndim == 2
        if unsqueezed:
            x = x[..., None]
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, in_ch // self.groups, self.out_channels),
            jnp.float32,
        )
        if self.padding == "same":
            lo, hi = _same_pad_1d(x.shape[1], self.kernel_size, self.stride, self.dilation)
            pads = [(lo, hi)]
        elif self.padding == "causal":
            pads = [((self.kernel_size - 1) * self.dilation, 0)]
        elif self.padding == "valid":
            pads = [(0, 0)]
        elif isinstance(self.padding, int):
            pads = [(self.padding, self.padding)]
        else:
            raise ValueError(f"Unsupported padding {self.padding}")
        # padding_mode applies to 'same' padding only; causal is always
        # zero-padded on the left (ref nnet/CNN.py:444-446). Reflect needs
        # pad < axis length; degenerate short axes fall back to zeros.
        if (
            self.padding == "same"
            and self.padding_mode != "constant"
            and pads[0] != (0, 0)
            and max(pads[0]) < x.shape[1]
        ):
            mode = {"reflect": "reflect", "replicate": "edge", "circular": "wrap"}[
                self.padding_mode
            ]
            x = jnp.pad(x, ((0, 0), pads[0], (0, 0)), mode=mode)
            pads = [(0, 0)]
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NWC", "WIO", "NWC"))
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.stride,),
            padding=pads,
            rhs_dilation=(self.dilation,),
            dimension_numbers=dn,
            feature_group_count=self.groups,
        )
        if self.bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
            y = y + b.astype(y.dtype)
        if unsqueezed and self.out_channels == 1:
            y = y[..., 0]
        return y


class Conv2d(nn.Module):
    """2-D convolution on (batch, time, feature, channel) — NHWC.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> conv = Conv2d(out_channels=8, kernel_size=(3, 3))
    >>> x = jnp.ones((10, 40, 16, 1))
    >>> p = conv.init(jax.random.PRNGKey(0), x)
    >>> conv.apply(p, x).shape
    (10, 40, 16, 8)
    """

    out_channels: int
    kernel_size: tuple = (3, 3)
    stride: tuple = (1, 1)
    dilation: tuple = (1, 1)
    padding: str = "same"
    groups: int = 1
    bias: bool = True
    padding_mode: str = "reflect"  # matches reference Conv2d (CNN.py:376)
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        unsqueezed = x.ndim == 3
        if unsqueezed:
            x = x[..., None]
        in_ch = x.shape[-1]
        ks = (
            (self.kernel_size, self.kernel_size)
            if isinstance(self.kernel_size, int)
            else tuple(self.kernel_size)
        )
        st = (self.stride, self.stride) if isinstance(self.stride, int) else tuple(self.stride)
        dl = (
            (self.dilation, self.dilation)
            if isinstance(self.dilation, int)
            else tuple(self.dilation)
        )
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            ks + (in_ch // self.groups, self.out_channels),
            jnp.float32,
        )
        if self.padding == "same":
            p0 = _same_pad_1d(x.shape[1], ks[0], st[0], dl[0])
            p1 = _same_pad_1d(x.shape[2], ks[1], st[1], dl[1])
            pads = [p0, p1]
        elif self.padding == "causal":
            pads = [((ks[0] - 1) * dl[0], 0), _same_pad_1d(x.shape[2], ks[1], st[1], dl[1])]
        elif self.padding == "valid":
            pads = [(0, 0), (0, 0)]
        else:
            raise ValueError(f"Unsupported padding {self.padding}")
        if (
            self.padding == "same"
            and self.padding_mode != "constant"
            and (pads[0] != (0, 0) or pads[1] != (0, 0))
            and max(pads[0]) < x.shape[1]
            and max(pads[1]) < x.shape[2]
        ):
            mode = {"reflect": "reflect", "replicate": "edge", "circular": "wrap"}[
                self.padding_mode
            ]
            x = jnp.pad(x, ((0, 0), pads[0], pads[1], (0, 0)), mode=mode)
            pads = [(0, 0), (0, 0)]
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=st,
            padding=pads,
            rhs_dilation=dl,
            dimension_numbers=dn,
            feature_group_count=self.groups,
        )
        if self.bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y


class ConvTranspose1d(nn.Module):
    """Transposed 1-D convolution (upsampling), NWC layout
    (reference nnet/CNN.py:782).

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> conv = ConvTranspose1d(out_channels=8, kernel_size=16, stride=8, padding=4)
    >>> x = jnp.ones((2, 100, 16))
    >>> p = conv.init(jax.random.PRNGKey(0), x)
    >>> conv.apply(p, x).shape
    (2, 800, 8)
    """

    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    padding: int = 0
    output_padding: int = 0
    groups: int = 1
    bias: bool = True
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        # layout (K, out, in/groups): with transpose_kernel=True this matches
        # the gradient-of-conv semantics of torch's ConvTranspose1d
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, self.out_channels, in_ch // self.groups),
            jnp.float32,
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        # torch-style transposed conv: L_out = (L-1)*stride - 2*pad + K + output_padding
        pad_lo = self.dilation * (self.kernel_size - 1) - self.padding
        pad_hi = pad_lo + self.output_padding
        if self.groups == 1:
            y = jax.lax.conv_transpose(
                x,
                kernel,
                strides=(self.stride,),
                padding=[(pad_lo, pad_hi)],
                rhs_dilation=(self.dilation,),
                dimension_numbers=("NWC", "WIO", "NWC"),
                transpose_kernel=True,
            )
        else:
            # grouped transpose: split in and out channels, run per group
            xs = jnp.split(x, self.groups, axis=-1)
            ks = jnp.split(kernel, self.groups, axis=1)
            ys = [
                jax.lax.conv_transpose(
                    xg,
                    kg,
                    strides=(self.stride,),
                    padding=[(pad_lo, pad_hi)],
                    rhs_dilation=(self.dilation,),
                    dimension_numbers=("NWC", "WIO", "NWC"),
                    transpose_kernel=True,
                )
                for xg, kg in zip(xs, ks)
            ]
            y = jnp.concatenate(ys, axis=-1)
        if self.bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y


class DepthwiseSeparableConv1d(nn.Module):
    """Depthwise + pointwise conv (reference nnet/CNN.py:1120)."""

    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    padding: str = "same"
    bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        y = Conv1d(
            out_channels=in_ch,
            kernel_size=self.kernel_size,
            stride=self.stride,
            dilation=self.dilation,
            padding=self.padding,
            groups=in_ch,
            bias=self.bias,
            name="depthwise",
        )(x)
        y = Conv1d(
            out_channels=self.out_channels,
            kernel_size=1,
            bias=self.bias,
            name="pointwise",
        )(y)
        return y


class SincConv(nn.Module):
    """Parameterized sinc band-pass filters (SincNet; reference
    nnet/CNN.py:30). Learns per-filter low/high cutoffs on the mel scale;
    the kernel is materialized inside jit so gradients flow to the cutoffs.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> conv = SincConv(out_channels=8, kernel_size=65)
    >>> x = jnp.ones((4, 16000, 1))
    >>> p = conv.init(jax.random.PRNGKey(0), x)
    >>> conv.apply(p, x).shape
    (4, 16000, 8)
    """

    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    padding: str = "same"
    sample_rate: int = 16000
    min_low_hz: float = 50.0
    min_band_hz: float = 50.0

    @nn.compact
    def __call__(self, x):
        if self.kernel_size % 2 == 0:
            raise ValueError("SincConv kernel size must be odd")
        unsqueezed = x.ndim == 2
        if unsqueezed:
            x = x[..., None]

        def init_cutoffs(key):
            low_hz = 30.0
            high_hz = self.sample_rate / 2 - (self.min_low_hz + self.min_band_hz)
            mel = np.linspace(
                2595 * np.log10(1 + low_hz / 700),
                2595 * np.log10(1 + high_hz / 700),
                self.out_channels + 1,
            )
            hz = 700 * (10 ** (mel / 2595) - 1)
            return jnp.asarray(hz[:-1], jnp.float32), jnp.asarray(
                np.diff(hz), jnp.float32
            )

        low_hz = self.param("low_hz", lambda k: init_cutoffs(k)[0][:, None])
        band_hz = self.param("band_hz", lambda k: init_cutoffs(k)[1][:, None])

        low = self.min_low_hz + jnp.abs(low_hz)
        high = jnp.clip(
            low + self.min_band_hz + jnp.abs(band_hz),
            self.min_low_hz,
            self.sample_rate / 2,
        )
        n = (self.kernel_size - 1) // 2
        n_ = (
            2 * math.pi * jnp.arange(-n, 0.0)[None, :] / self.sample_rate
        )  # (1, n)
        window = 0.54 - 0.46 * jnp.cos(
            2 * math.pi * jnp.arange(self.kernel_size) / self.kernel_size
        )[:n]
        f_times_t_low = low * n_
        f_times_t_high = high * n_
        band_pass_left = (
            (jnp.sin(f_times_t_high) - jnp.sin(f_times_t_low)) / (n_ / 2)
        ) * window
        band_pass_center = 2 * (high - low)
        band_pass = jnp.concatenate(
            [band_pass_left, band_pass_center, band_pass_left[:, ::-1]], axis=1
        )
        band_pass = band_pass / (2 * (high - low))
        kernel = band_pass.T[:, None, :]  # (K, 1, out)
        pads = (
            [_same_pad_1d(x.shape[1], self.kernel_size, self.stride, self.dilation)]
            if self.padding == "same"
            else [(0, 0)]
        )
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NWC", "WIO", "NWC"))
        return jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(self.stride,),
            padding=pads,
            rhs_dilation=(self.dilation,),
            dimension_numbers=dn,
        )


class GaborConv1d(nn.Module):
    """Learnable Gabor filters (LEAF frontend; reference nnet/CNN.py:1221).

    Filters are parameterized by (center frequency, inverse bandwidth);
    real and imaginary responses are produced as 2*n_filters channels.
    """

    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: str = "same"
    sample_rate: int = 16000
    min_freq: float = 60.0
    max_freq: float = None
    sort_filters: bool = False

    @nn.compact
    def __call__(self, x):
        unsqueezed = x.ndim == 2
        if unsqueezed:
            x = x[..., None]
        n_filters = self.out_channels // 2
        max_freq = self.max_freq or self.sample_rate / 2

        def init_kernel(key):
            # mel-spaced center freqs, bandwidth from mel filter widths
            mel_lo = 2595 * np.log10(1 + self.min_freq / 700)
            mel_hi = 2595 * np.log10(1 + max_freq / 700)
            mel_pts = np.linspace(mel_lo, mel_hi, n_filters + 2)
            hz = 700 * (10 ** (mel_pts / 2595) - 1)
            centers = hz[1:-1]
            fwhms = (hz[2:] - hz[:-2]) / 2
            center_norm = centers * 2 * np.pi / self.sample_rate
            # convert fwhm (Hz) to gaussian width in samples
            sigmas = self.sample_rate / (2 * np.pi * fwhms / np.sqrt(2 * np.log(2)))
            return jnp.asarray(
                np.stack([center_norm, sigmas], axis=1), jnp.float32
            )

        kernel_params = self.param("kernel_params", init_kernel)
        centers = kernel_params[:, 0:1]
        sigmas = jnp.clip(kernel_params[:, 1:2], 4 * np.sqrt(2 * np.log(2)), None)
        t = jnp.arange(-(self.kernel_size // 2), self.kernel_size // 2 + 1.0)[None, :]
        denom = 1.0 / (jnp.sqrt(2 * math.pi) * sigmas)
        gauss = jnp.exp(-(t**2) / (2 * sigmas**2))
        real = denom * gauss * jnp.cos(centers * t)
        imag = denom * gauss * jnp.sin(centers * t)
        filters = jnp.concatenate([real, imag], axis=0)  # (2*n_filters, K)
        kernel = filters.T[:, None, :]  # (K, 1, out)
        pads = (
            [_same_pad_1d(x.shape[1], self.kernel_size, self.stride, 1)]
            if self.padding == "same"
            else [(0, 0)]
        )
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NWC", "WIO", "NWC"))
        return jax.lax.conv_general_dilated(
            x, kernel, (self.stride,), pads, dimension_numbers=dn
        )
