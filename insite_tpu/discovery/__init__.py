from insite_tpu.discovery.library import PolynomialLibrary
from insite_tpu.discovery.differentiate import (savgol_coeffs_matrix,
                                                windowed_filter,
                                                savgol_smooth,
                                                finite_difference)
from insite_tpu.discovery.stlsq import stlsq, stlsq_hostsolve, masked_ridge
