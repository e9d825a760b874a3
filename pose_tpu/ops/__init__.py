from . import (colour, heatmap, occluder, partial_conv, recon, warp,
               warp_pallas)
