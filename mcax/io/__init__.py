from mcax.io.wav import read_wav, write_wav
