from .packetcomms import PacketMuxer, PacketDemuxer, PACKET_TYPES
from .server import InterfaceServer
from .client import InterfaceClient
