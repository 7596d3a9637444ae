from insite_tpu.models.nn.blocks import (BRTreatmentOutcomeHead,
                                         ROutcomeVitalsHead,
                                         VariationalLSTM,
                                         TransformerMultiInputBlock,
                                         TransformerEncoderBlock,
                                         TransformerDecoderBlock,
                                         grad_reverse)
