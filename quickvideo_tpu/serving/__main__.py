from quickvideo_tpu.serving.server import main

main()
