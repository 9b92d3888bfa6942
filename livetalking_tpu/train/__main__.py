from livetalking_tpu.train.cli import main

main()
