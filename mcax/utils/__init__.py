from mcax.utils import checkpoint as checkpoint
from mcax.utils import metrics as metrics
