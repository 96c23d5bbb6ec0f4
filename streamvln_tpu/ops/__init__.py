from streamvln_tpu.ops.attention import dense_attention, mha_attention
