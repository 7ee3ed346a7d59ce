from .mesh import (make_mesh, sharded_typing_step, sharded_align_step,
                   full_step)
