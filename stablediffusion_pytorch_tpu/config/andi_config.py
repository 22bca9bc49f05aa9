"""Progressive-QAT schedule knobs (reference: config/andi_config.py:1-30).

Stage pipeline: FP -> LSQ quantization-noise ("QN") -> analog-noise
("AnDi") -> ADC/DAC array ("ADDA"); each stage linearly interpolates its
*_range knobs over `cycle` progressive-training cycles.
"""

train_stage = "FP"

# ---- QN stage ----
qn_cycle = 50
qn_weight_bit_range = [8, 4]
qn_feature_bit_range = [8, 8]
qn_noise_range = [0.00, 0.08]

# ---- AnDi stage ----
qna_cycle = 50
qna_weight_bit_range = [4, 4]
qna_feature_bit_range = [8, 8]
qna_noise_range = [0.08, 0.1]

# ---- ADDA stage ----
adda_cycle = 2
adda_weight_bit_range = [4, 4]
adda_input_bit_range = [8, 5]
adda_output_bit_range = [8, 8]
adda_noise_range = [0.08, 0.08]
adda_adc_bit_range = [8, 8]
adda_dac_bit_range = [5, 5]
