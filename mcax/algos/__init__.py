from mcax.algos import gcc as gcc
from mcax.algos import srp as srp
from mcax.algos import delaysum as delaysum
from mcax.algos import covariance as covariance
from mcax.algos import mvdr as mvdr
from mcax.algos import tracking as tracking
from mcax.algos import masking as masking
