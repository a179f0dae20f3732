from euler_tpu.ops.alias import (alias_draw, build_alias_table,
                                 build_typed_alias_tables)
