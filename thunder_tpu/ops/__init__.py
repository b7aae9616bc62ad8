from . import fft, ctf, spectrum, filters, mask, kernels, translate, pixels
